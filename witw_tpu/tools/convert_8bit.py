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

# Band orders per satellite product (reference convert_strips.py:14-77).
BAND_ORDERS = {
    "wv3_psms": (5, 3, 2),  # 1-based band indices for R, G, B
    "wv2": (3, 2, 1),
}

DEFAULT_AOI_BANDS = {
    "rio": "wv2", "vegas": "wv3_psms", "paris": "wv3_psms", "shanghai": "wv3_psms",
    "khartoum": "wv3_psms", "atlanta": "wv2", "moscow": "wv2", "mumbai": "wv2",
    "san": "wv2", "dar": "wv2", "rotterdam": "wv2",
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
    fixed_range: Tuple[float, float] = (0.0, 2000.0),
    per_band_ranges: Optional[Dict[int, Tuple[float, float]]] = None,
    percentiles: Tuple[float, float] = (2.0, 98.0),
    gamma: Optional[float] = None,
) -> np.ndarray:
    """HWC any-dtype -> uint8 with per-band scaling."""
    img = img.astype(np.float64)
    out = np.zeros(img.shape, np.uint8)
    for b in range(img.shape[2]):
        band = img[..., b]
        if rescale == "perc":
            lo, hi = band_percentiles(band, *percentiles)
        elif rescale == "clip":
            lo, hi = fixed_range
        elif rescale == "dict":
            lo, hi = (per_band_ranges or {}).get(b, fixed_range)
        else:
            raise ValueError(rescale)
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
    **kw,
) -> bool:
    """Convert one raster; returns False if skipped (too many zero pixels,
    reference create_8bit_images.py:113-118)."""
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

    _os.makedirs(dst_dir, exist_ok=True)
    done = 0
    for city, product in DEFAULT_AOI_BANDS.items():
        fn = strip_filename(city)
        src = _os.path.join(src_dir, fn)
        if not _os.path.exists(src):
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
    parser.add_argument("--rescale", choices=["perc", "clip", "dict"], default="perc")
    parser.add_argument("--gamma", type=float, default=None)
    parser.add_argument("--workers", type=int, default=12)
    args = parser.parse_args(argv)
    if os.path.isdir(args.src):
        n = dir_to_8bit(args.src, args.dst, args.bands, args.workers,
                        rescale=args.rescale, gamma=args.gamma)
        print(f"converted {n} rasters")
    else:
        ok = convert_to_8bit(args.src, args.dst, args.bands,
                             rescale=args.rescale, gamma=args.gamma)
        print("converted" if ok else "skipped (zero fraction)")


if __name__ == "__main__":
    main()
