"""Semantic road-mask precompute for the 4-channel overhead data path.

The reference's offline ``augment.py`` runs an external CRESI road-segmentation
checkpoint over every overhead tile, sigmoids + min-max normalizes the
prediction and writes RGB+mask 4-channel uint8 TIFFs into ``cresi_uint8/``
(reference model/augment.py:61-87), consumed by cvig_semantic
(cvig_semantic.py:111-117). The checkpoint is external and not redistributable
(SURVEY.md §2.5), so here the segmenter is pluggable:

- any callable (H, W, 3) uint8 -> (H, W) float in [0, 1] can be passed in
  (e.g. a JAX/torch road-segmentation model),
- the built-in fallback is a classical edge/brightness road-likelihood
  heuristic (cv2) so the 4-channel data contract can be produced and tested
  end-to-end without external weights.
"""

from __future__ import annotations

import argparse
import os
from typing import Callable, Optional

import numpy as np

from witw_tpu.tools.geotiff import GeoTiff, write_geotiff_u8

Segmenter = Callable[[np.ndarray], np.ndarray]


def heuristic_road_mask(rgb: np.ndarray) -> np.ndarray:
    """Classical road-likelihood stand-in: low-saturation, mid-brightness,
    locally-smooth pixels score high. Returns float [0, 1]."""
    import cv2

    rgb8 = rgb.astype(np.uint8)
    hsv = cv2.cvtColor(rgb8, cv2.COLOR_RGB2HSV).astype(np.float32)
    sat = hsv[..., 1] / 255.0
    val = hsv[..., 2] / 255.0
    gray = cv2.cvtColor(rgb8, cv2.COLOR_RGB2GRAY).astype(np.float32)
    smooth = cv2.GaussianBlur(gray, (0, 0), 2.0)
    texture = np.abs(gray - smooth) / 255.0
    texture = cv2.GaussianBlur(texture, (0, 0), 3.0)
    # gray-ish + not too dark/bright + low texture
    score = (1.0 - sat) * np.exp(-(((val - 0.45) / 0.25) ** 2)) * np.exp(-texture * 25.0)
    lo, hi = np.percentile(score, 2), np.percentile(score, 98)
    return np.clip((score - lo) / max(hi - lo, 1e-6), 0.0, 1.0)


def normalize_prediction(pred: np.ndarray) -> np.ndarray:
    """Sigmoid + min-max normalize (reference augment.py:75-79)."""
    pred = 1.0 / (1.0 + np.exp(-pred.astype(np.float64)))
    lo, hi = pred.min(), pred.max()
    return (pred - lo) / max(hi - lo, 1e-12)


def precompute_masks(
    overhead_dir: str,
    out_dir: Optional[str] = None,
    segmenter: Optional[Segmenter] = None,
    logits: bool = False,
    verbose: bool = True,
) -> int:
    """Write RGB+mask 4-channel uint8 TIFFs into ``<parent>/cresi_uint8/``
    (the directory name cvig_semantic reads, reference cvig_semantic.py:111)."""
    if out_dir is None:
        out_dir = os.path.join(os.path.dirname(overhead_dir.rstrip("/")), "cresi_uint8")
    os.makedirs(out_dir, exist_ok=True)
    segmenter = segmenter or heuristic_road_mask
    count = 0
    for name in sorted(os.listdir(overhead_dir)):
        if not name.lower().endswith((".tif", ".tiff", ".png", ".jpg")):
            continue
        path = os.path.join(overhead_dir, name)
        with GeoTiff(path) as tif:
            rgb = tif.read()[..., :3]
            gt = tif.geotransform
            epsg = tif.epsg
        mask = segmenter(rgb.astype(np.float32))
        if logits:
            mask = normalize_prediction(mask)
        mask8 = np.round(np.clip(mask, 0, 1) * 255).astype(np.uint8)
        out = np.concatenate([rgb.astype(np.uint8), mask8[..., None]], axis=-1)
        out_path = os.path.join(out_dir, os.path.splitext(name)[0] + ".tif")
        write_geotiff_u8(out_path, out, gt, epsg)
        count += 1
        if verbose and count % 100 == 0:
            print(f"{count} masks written")
    return count


def main(argv=None):
    parser = argparse.ArgumentParser(description="Precompute 4-channel road-mask tiles")
    parser.add_argument("--overhead-dir", required=True)
    parser.add_argument("--out-dir", default=None)
    args = parser.parse_args(argv)
    n = precompute_masks(args.overhead_dir, args.out_dir)
    print(f"wrote {n} masked tiles")


if __name__ == "__main__":
    main()
