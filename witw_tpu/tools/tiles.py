"""Dataset heart: photo metadata -> CSV, and overhead tile extraction.

TPU-free host tooling replacing reference tools/dataset_building/sitetiles.py:
- ``metadata_to_frame``: flatten per-city Flickr ``metadata.json`` into a
  DataFrame (reference sitetiles.py:86-93).
- ``annotate_frame``: add license text/URL, satellite name and the
  surface_path/overhead_path columns that become CSV columns 15/16 — the
  exact columns the models read (reference sitetiles.py:96-121).
- ``clip_tiles``: for each photo, convert its WGS84 geotag to the strip's UTM
  (witw_tpu native geodesy instead of osr, reference sitetiles.py:147-151)
  and extract an ``edge``-meter tile around it via a windowed read (instead
  of gdal.Translate(projWin=...), reference sitetiles.py:161-171).
"""

from __future__ import annotations

import argparse
import json
import os
from typing import Iterable, Optional

import numpy as np
import pandas as pd

from witw_tpu.tools.cities import CITIES, TEST_CITIES, strip_filename
from witw_tpu.tools.geotiff import GeoTiff, utm_to_wgs84, wgs84_to_utm, write_geotiff_u8

LICENSE_URLS = {
    "CC BY-SA 4.0": "https://creativecommons.org/licenses/by-sa/4.0/",
    "CC BY 2.0": "https://creativecommons.org/licenses/by/2.0/",
    "CC BY-SA 2.0": "https://creativecommons.org/licenses/by-sa/2.0/",
    "CC BY-NC 2.0": "https://creativecommons.org/licenses/by-nc/2.0/",
    "CC0": "https://creativecommons.org/publicdomain/zero/1.0/",
}


def metadata_to_frame(metadata_path: str, city: str) -> pd.DataFrame:
    """Flatten a Flickr metadata.json (list of photo dicts) to rows."""
    with open(metadata_path) as f:
        records = json.load(f)
    rows = []
    for rec in records:
        rows.append(
            {
                "aoi": city,
                "id": str(rec.get("id", "")),
                "owner": rec.get("owner", ""),
                "title": rec.get("title", ""),
                "datetaken": rec.get("datetaken", ""),
                "latitude": float(rec.get("latitude", 0.0)),
                "longitude": float(rec.get("longitude", 0.0)),
                "accuracy": rec.get("accuracy", ""),
                "license": str(rec.get("license", "")),
                # url_o is present only when the owner allows original
                # downloads; url_m always is (the reference's url_field)
                "url": rec.get("url_o") or rec.get("url_m")
                       or rec.get("url", ""),
            }
        )
    return pd.DataFrame(rows)


def annotate_frame(frame: pd.DataFrame) -> pd.DataFrame:
    """Add license/satellite columns + surface/overhead path columns
    (columns 15/16 of the final CSV, consumed by the models)."""
    frame = frame.copy()
    city_meta = frame["aoi"].map(lambda c: CITIES.get(c))
    frame["license_name"] = [m.license if m else "" for m in city_meta]
    frame["license_url"] = frame["license_name"].map(lambda n: LICENSE_URLS.get(n, ""))
    frame["satellite"] = [m.satellite if m else "" for m in city_meta]
    frame["city_fullname"] = [m.fullname if m else "" for m in city_meta]
    frame["photo_license_url"] = frame.get("url", "")
    frame["surface_path"] = [
        os.path.join("surface", f"{aoi}_{pid}.jpg")
        for aoi, pid in zip(frame["aoi"], frame["id"])
    ]
    frame["overhead_path"] = [
        os.path.join("overhead", f"{aoi}_{pid}.tif")
        for aoi, pid in zip(frame["aoi"], frame["id"])
    ]
    # Reorder so surface_path/overhead_path land at columns 15/16 (the model
    # reads usecols=[15,16], reference cvig_fov.py:46-47).
    lead = [
        "aoi", "id", "owner", "title", "datetaken", "latitude", "longitude",
        "accuracy", "license", "url", "license_name", "license_url",
        "satellite", "city_fullname", "photo_license_url",
    ]
    cols = lead + ["surface_path", "overhead_path"]
    for c in cols:
        if c not in frame.columns:
            frame[c] = ""
    return frame[cols]


def build_csv(metadata_root: str, out_csv: str, cities: Optional[Iterable[str]] = None) -> pd.DataFrame:
    """metadata/{city}/metadata.json -> one annotated dataset.csv."""
    frames = []
    for city in cities or CITIES:
        path = os.path.join(metadata_root, city, "metadata.json")
        if os.path.exists(path):
            frames.append(metadata_to_frame(path, city))
    frame = annotate_frame(pd.concat(frames, ignore_index=True))
    frame.to_csv(out_csv, index=False)
    return frame


def clip_tiles(
    frame: pd.DataFrame,
    sat_dir: str,
    out_dir: str,
    edge: float = 225.0,
    verbose: bool = False,
) -> pd.DataFrame:
    """Extract an edge x edge meter overhead tile centered on each photo.

    Returns the frame filtered to rows whose tile was written.
    """
    os.makedirs(os.path.join(out_dir, "overhead"), exist_ok=True)
    kept = []
    strips = {}
    for _, row in frame.iterrows():
        city = row["aoi"]
        if city not in strips:
            path = os.path.join(sat_dir, strip_filename(city))
            strips[city] = GeoTiff(path) if os.path.exists(path) else None
        tif = strips[city]
        if tif is None:
            continue
        if tif.dtype != np.uint8:
            raise ValueError(
                f"{strip_filename(city)} is {tif.dtype}: run the 16->8-bit "
                "conversion (tools/convert_8bit.py) before tile extraction — "
                "astype(uint8) would wrap sample values modulo 256"
            )
        # Project into the STRIP's grid (its zone + hemisphere), not the zone
        # implied by the photo's own longitude: near a zone boundary those
        # differ by hundreds of km and the tile silently reads off-raster.
        easting, northing, _ = wgs84_to_utm(
            row["latitude"], row["longitude"], epsg=tif.epsg
        )
        half = edge / 2.0
        tile = tif.read_world_window(
            easting - half, northing + half, easting + half, northing - half
        )
        if tile.size == 0 or tile.max() == 0:
            continue
        out_path = os.path.join(out_dir, row["overhead_path"])
        gt = tif.geotransform
        tile_gt = np.array(
            [easting - half, gt[1], 0.0, northing + half, 0.0, gt[5]]
        )
        write_geotiff_u8(out_path, tile.astype(np.uint8), tile_gt, tif.epsg)
        kept.append(row)
        if verbose:
            print(f"clipped {out_path}")
    for tif in strips.values():
        if tif is not None:
            tif.close()
    return pd.DataFrame(kept).reset_index(drop=True) if kept else frame.iloc[:0]


def split_train_test(frame: pd.DataFrame, test_cities=TEST_CITIES):
    """Held-out-city split (reference build_dataset:59-63: Paris = test)."""
    is_test = frame["aoi"].isin(list(test_cities))
    return frame[~is_test].reset_index(drop=True), frame[is_test].reset_index(drop=True)


def main(argv=None):
    parser = argparse.ArgumentParser(description="Build dataset CSV / clip overhead tiles")
    sub = parser.add_subparsers(dest="cmd", required=True)
    p_csv = sub.add_parser("csv", help="metadata.json files -> dataset.csv")
    p_csv.add_argument("--metadata-root", required=True)
    p_csv.add_argument("--out", default="dataset.csv")
    p_ds = sub.add_parser("dataset", help="clip overhead tiles for each photo")
    p_ds.add_argument("--csv", required=True)
    p_ds.add_argument("--sat-dir", required=True)
    p_ds.add_argument("--out-dir", required=True)
    p_ds.add_argument("--edge", type=float, default=225.0)
    args = parser.parse_args(argv)
    if args.cmd == "csv":
        frame = build_csv(args.metadata_root, args.out)
        print(f"wrote {len(frame)} rows to {args.out}")
    else:
        frame = pd.read_csv(args.csv)
        kept = clip_tiles(frame, args.sat_dir, args.out_dir, args.edge, verbose=True)
        print(f"clipped {len(kept)}/{len(frame)} tiles")


if __name__ == "__main__":
    main()
