"""Geographic density limiter.

Greedy thinning: per AOI, keep a shuffled photo only if its haversine
distance to every already-kept photo is at least `threshold` meters
(reference tools/dataset_building/limit_density.py:27-63). The O(N_kept)
scan per photo is vectorized with numpy.
"""

from __future__ import annotations

import argparse

import numpy as np
import pandas as pd

EARTH_RADIUS_M = 6371008.8


def haversine_m(lat1, lon1, lat2, lon2) -> np.ndarray:
    """Great-circle distance in meters; vectorized over (lat2, lon2)."""
    lat1, lon1 = np.radians(lat1), np.radians(lon1)
    lat2, lon2 = np.radians(np.asarray(lat2)), np.radians(np.asarray(lon2))
    dlat = lat2 - lat1
    dlon = lon2 - lon1
    a = np.sin(dlat / 2) ** 2 + np.cos(lat1) * np.cos(lat2) * np.sin(dlon / 2) ** 2
    return 2 * EARTH_RADIUS_M * np.arcsin(np.sqrt(a))


def limit_density(
    frame: pd.DataFrame, threshold_m: float = 10.0, seed: int = 0
) -> pd.DataFrame:
    """Thin the frame per AOI so no two kept photos are closer than
    threshold_m. Order is shuffled (seeded) like the reference."""
    kept_parts = []
    for aoi, group in frame.groupby("aoi"):
        group = group.sample(frac=1.0, random_state=seed)
        kept_lat = np.empty(0)
        kept_lon = np.empty(0)
        keep_mask = []
        for _, row in group.iterrows():
            if kept_lat.size == 0:
                ok = True
            else:
                ok = bool(
                    np.all(
                        haversine_m(row["latitude"], row["longitude"], kept_lat, kept_lon)
                        >= threshold_m
                    )
                )
            keep_mask.append(ok)
            if ok:
                kept_lat = np.append(kept_lat, row["latitude"])
                kept_lon = np.append(kept_lon, row["longitude"])
        kept_parts.append(group[np.asarray(keep_mask)])
    return pd.concat(kept_parts).reset_index(drop=True)


def main(argv=None):
    parser = argparse.ArgumentParser(description="Thin photos by geographic density")
    parser.add_argument("--csv", required=True)
    parser.add_argument("--out", required=True)
    parser.add_argument("--threshold", type=float, default=10.0, help="meters")
    args = parser.parse_args(argv)
    frame = pd.read_csv(args.csv)
    out = limit_density(frame, args.threshold)
    out.to_csv(args.out, index=False)
    print(f"kept {len(out)}/{len(frame)} photos")


if __name__ == "__main__":
    main()
