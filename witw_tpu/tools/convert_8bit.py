"""16-bit pansharpened strips -> 8-bit RGB (band-select + rescale).

Replaces reference tools/dataset_building/create_8bit_images.py (which shells
out to the gdal_translate binary) with the native windowed reader + in-process
scaling. Capabilities mirrored:
- band selection/order per AOI (WV-3 PS-MS uses bands [5,3,2], WV-2 AOIs
  [3,2,1] — reference convert_strips.py:14-77),
- per-band rescale from a low/high percentile of *positive* pixels (the
  reference's rescale_type='perc' with 2-98 defaults,
  create_8bit_images.py:85-111), a fixed clip range, or explicit per-band
  ranges,
- optional gamma correction (create_8bit_images.py:163-172),
- skip images whose zero-pixel fraction exceeds a threshold (30%,
  create_8bit_images.py:113-118),
- directory driver with a process pool (create_8bit_images.py:215-244).
"""

from __future__ import annotations

import argparse
import os
from concurrent.futures import ProcessPoolExecutor
from typing import Dict, Optional, Sequence, Tuple

import numpy as np

from witw_tpu.tools.geotiff import GeoTiff, write_geotiff_u8

# Band orders per satellite product (reference convert_strips.py:14-77):
# the 8 PS-MS AOIs (vegas, paris, shanghai, khartoum, moscow, mumbai, san,
# dar) convert with [5,3,2]; the PS-RGBNIR/merged AOIs (atlanta, rotterdam)
# with [3,2,1]; rio's strip is PRE-PROCESSED RGB and is never converted
# (reference stitches its tiles directly, convert_strips.py:4-5,17-18).
BAND_ORDERS = {
    "wv3_psms": (5, 3, 2),  # 1-based band indices for R, G, B
    "rgbnir": (3, 2, 1),
}

DEFAULT_AOI_BANDS = {
    "rio": None, "vegas": "wv3_psms", "paris": "wv3_psms",
    "shanghai": "wv3_psms", "khartoum": "wv3_psms", "atlanta": "rgbnir",
    "moscow": "wv3_psms", "mumbai": "wv3_psms", "san": "wv3_psms",
    "dar": "wv3_psms", "rotterdam": "rgbnir",
}

# Reference per-band min/max tables ("numbers retrieved from
# all_dems_min_max.py ... over the entirety of SN3",
# create_8bit_images.py:20-36), keyed by 1-based SOURCE band id.
RESCALE_TABLES = {
    "tot_3band": {1: (63, 1178), 2: (158, 1285), 3: (148, 880)},
    "tot_8band": {
        1: (154, 669), 2: (122, 1061), 3: (119, 1520), 4: (62, 1497),
        5: (20, 1342), 6: (36, 1505), 7: (17, 1853), 8: (7, 1559),
    },
}


def band_percentiles(
    band: np.ndarray, low: float = 2.0, high: float = 98.0
) -> Tuple[float, float]:
    """Percentiles over positive pixels only (zeros are nodata,
    reference create_8bit_images.py:97-104)."""
    positive = band[band > 0]
    if positive.size == 0:
        return 0.0, 1.0
    return float(np.percentile(positive, low)), float(np.percentile(positive, high))


def rescale_to_u8(
    img: np.ndarray,
    rescale: str = "perc",
    fixed_range: Tuple[float, float] = (0.0, 65535.0),
    per_band_ranges: Optional[Dict[int, Tuple[float, float]]] = None,
    percentiles: Tuple[float, float] = (2.0, 98.0),
    gamma: Optional[float] = None,
) -> np.ndarray:
    """HWC any-dtype -> uint8 with per-band scaling.

    'clip' spans the full 16-bit range like the reference
    (create_8bit_images.py:126-127: bmin, bmax = 0, 65535); 'dict' reads
    ``per_band_ranges`` keyed by the OUTPUT channel index (callers translate
    from the reference's source-band tables, RESCALE_TABLES). The reference
    floors every mode's lo at 1 (create_8bit_images.py:136)."""
    img = img.astype(np.float64)
    out = np.zeros(img.shape, np.uint8)
    for b in range(img.shape[2]):
        band = img[..., b]
        if rescale == "perc":
            lo, hi = band_percentiles(band, *percentiles)
        elif rescale == "clip":
            lo, hi = fixed_range
        elif rescale == "dict":
            if per_band_ranges is None or b not in per_band_ranges:
                raise ValueError(
                    f"rescale='dict' needs per_band_ranges for channel {b} "
                    "(see RESCALE_TABLES for the reference's tables)"
                )
            lo, hi = per_band_ranges[b]
        else:
            raise ValueError(rescale)
        lo = max(1.0, float(lo))  # reference: bmin = max(1, bmin)
        if hi <= lo:
            hi = lo + 1.0
        scaled = np.clip((band - lo) / (hi - lo), 0.0, 1.0)
        if gamma:
            scaled = np.power(scaled, 1.0 / gamma)
        out[..., b] = np.round(scaled * 255.0).astype(np.uint8)
    return out


def zero_fraction(img: np.ndarray) -> float:
    """Fraction of pixels zero in all bands (reference zero_frac.py:1-17)."""
    return float(np.mean(np.all(img == 0, axis=-1)))


def convert_to_8bit(
    src_path: str,
    dst_path: str,
    bands: Sequence[int] = (1, 2, 3),
    rescale: str = "perc",
    gamma: Optional[float] = None,
    max_zero_frac: float = 0.3,
    table: Optional[str] = None,
    **kw,
) -> bool:
    """Convert one raster; returns False if skipped (too many zero pixels,
    reference create_8bit_images.py:113-118). ``table`` selects a reference
    per-band range table (RESCALE_TABLES, keyed by SOURCE band id) and
    implies rescale='dict'."""
    if table:
        src_ranges = RESCALE_TABLES[table]
        kw["per_band_ranges"] = {
            i: src_ranges[b] for i, b in enumerate(bands)
        }
        rescale = "dict"
    with GeoTiff(src_path) as tif:
        img = tif.read()
        sel = np.stack([img[..., b - 1] for b in bands], axis=-1)
        if zero_fraction(sel) > max_zero_frac:
            return False
        out = rescale_to_u8(sel, rescale=rescale, gamma=gamma, **kw)
        write_geotiff_u8(dst_path, out, tif.geotransform, tif.epsg)
    return True


def _convert_job(args):
    return convert_to_8bit(*args[:2], **args[2])


def dir_to_8bit(
    src_dir: str,
    dst_dir: str,
    bands: Sequence[int] = (1, 2, 3),
    n_workers: int = 12,
    **kw,
) -> int:
    """Convert every .tif in a directory with a process pool
    (reference create_8bit_images.py:215-244)."""
    os.makedirs(dst_dir, exist_ok=True)
    jobs = []
    for name in sorted(os.listdir(src_dir)):
        if not name.lower().endswith((".tif", ".tiff")):
            continue
        jobs.append(
            (os.path.join(src_dir, name), os.path.join(dst_dir, name),
             dict(bands=bands, **kw))
        )
    done = 0
    if n_workers <= 1:
        for j in jobs:
            done += bool(_convert_job(j))
    else:
        with ProcessPoolExecutor(n_workers) as pool:
            for ok in pool.map(_convert_job, jobs):
                done += bool(ok)
    return done


def convert_strips(src_dir: str, dst_dir: str, n_workers: int = 12) -> int:
    """Per-AOI strip conversion driver with the right band order per
    satellite product (reference tools/dataset_building/convert_strips.py:14-77:
    WV-3 PS-MS strips use bands [5,3,2]; WV-2 AOIs use [3,2,1])."""
    import os as _os

    from witw_tpu.tools.cities import strip_filename

    import shutil

    _os.makedirs(dst_dir, exist_ok=True)
    done = 0
    for city, product in DEFAULT_AOI_BANDS.items():
        fn = strip_filename(city)
        src = _os.path.join(src_dir, fn)
        if not _os.path.exists(src):
            continue
        if product is None:
            # rio's strip is pre-processed RGB — the reference never runs it
            # through conversion (convert_strips.py:17-18); pass it through
            shutil.copyfile(src, _os.path.join(dst_dir, fn))
            done += 1
            continue
        bands = BAND_ORDERS[product]
        if convert_to_8bit(src, _os.path.join(dst_dir, fn), bands=bands):
            done += 1
    return done


def main(argv=None):
    parser = argparse.ArgumentParser(description="16-bit -> 8-bit RGB conversion")
    parser.add_argument("--src", required=True, help="source file or directory")
    parser.add_argument("--dst", required=True)
    parser.add_argument("--bands", type=int, nargs=3, default=(1, 2, 3),
                        help="1-based R G B band indices")
    parser.add_argument("--rescale",
                        choices=["perc", "clip", "tot_3band", "tot_8band"],
                        default="perc",
                        help="perc = 2-98 percentile of positive pixels; "
                             "clip = full 16-bit range; tot_3band/tot_8band "
                             "= the reference's fixed per-band SN3 tables")
    parser.add_argument("--gamma", type=float, default=None)
    parser.add_argument("--workers", type=int, default=12)
    args = parser.parse_args(argv)
    table = args.rescale if args.rescale in RESCALE_TABLES else None
    rescale = "dict" if table else args.rescale
    if os.path.isdir(args.src):
        n = dir_to_8bit(args.src, args.dst, args.bands, args.workers,
                        rescale=rescale, gamma=args.gamma, table=table)
        print(f"converted {n} rasters")
    else:
        ok = convert_to_8bit(args.src, args.dst, args.bands,
                             rescale=rescale, gamma=args.gamma, table=table)
        print("converted" if ok else "skipped (zero fraction)")


if __name__ == "__main__":
    main()
