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


def minmax_normalize(pred: np.ndarray) -> np.ndarray:
    """Min-max normalize an already-activated prediction (the reference
    min-max-normalizes AFTER torch.sigmoid, augment.py:77). float32
    arithmetic like the reference so the subsequent uint8 truncation lands
    on identical integers."""
    pred = pred.astype(np.float32)
    lo, hi = pred.min(), pred.max()
    return (pred - lo) / max(hi - lo, np.float32(1e-12))


def torch_segmenter(checkpoint_path: str, device: str = "cpu") -> Segmenter:
    """Segmenter backed by a user-supplied torch segmentation checkpoint —
    the reference's CRESI path (``torch.load('../fold0_best.pth')``,
    augment.py:61). The checkpoint must deserialize to a full nn.Module (the
    reference relies on pytorch_zoo being importable for exactly this).

    Math matches augment.py:72-79: input scaled /255, CHW batch of 1,
    ``torch.sigmoid(model(x))``. The min-max normalization is applied by the
    caller (``precompute_masks(..., minmax=True)``). Single-channel output is
    returned as (H, W) without the reference's latent transpose (for C=1 its
    ``squeeze()``+``moveaxis(0,-1)`` flips H/W on square tiles — a quirk not
    copied, see SURVEY.md §7 'quirks not to copy'); multi-channel output maps
    [C, H, W] -> channel 0.
    """
    import torch

    model = torch.load(checkpoint_path, map_location=device, weights_only=False)
    if hasattr(model, "eval"):
        model.eval()
    else:
        raise ValueError(
            f"{checkpoint_path} does not contain a full nn.Module (got "
            f"{type(model).__name__}); a bare state_dict cannot be run without "
            "its architecture"
        )

    def segment(rgb: np.ndarray) -> np.ndarray:
        x = torch.tensor(
            np.transpose(rgb.astype(np.float32) / 255.0, (2, 0, 1))[None],
            device=device,
        )
        with torch.no_grad():
            pred = torch.sigmoid(model(x))
        pred = pred.detach().cpu().numpy()
        pred = pred.reshape(pred.shape[-3:]) if pred.ndim == 4 else pred
        if pred.ndim == 3:  # [C, H, W]
            pred = pred[0]
        return pred.astype(np.float32)

    return segment


def precompute_masks(
    overhead_dir: str,
    out_dir: Optional[str] = None,
    segmenter: Optional[Segmenter] = None,
    logits: bool = False,
    minmax: bool = False,
    verbose: bool = True,
) -> int:
    """Write RGB+mask 4-channel uint8 TIFFs into ``<parent>/cresi_uint8/``
    (the directory name cvig_semantic reads, reference cvig_semantic.py:111).

    ``logits``: the segmenter returns raw logits -> sigmoid + min-max.
    ``minmax``: the segmenter returns probabilities -> min-max only (the
    reference order with a torch checkpoint: sigmoid inside the segmenter,
    then min-max, augment.py:75-79)."""
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
        elif minmax:
            mask = minmax_normalize(mask)
        if minmax:
            # reference truncates: (pred*255).type(torch.uint8), augment.py:81-85
            mask8 = (np.clip(mask, 0, 1) * 255).astype(np.uint8)
        else:
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
    parser.add_argument(
        "--torch-checkpoint", default=None,
        help="path to a torch segmentation checkpoint (full nn.Module, e.g. "
             "CRESI fold0_best.pth — reference augment.py:61); omit for the "
             "built-in heuristic mask",
    )
    parser.add_argument("--device", default="cpu")
    args = parser.parse_args(argv)
    if args.torch_checkpoint:
        seg = torch_segmenter(args.torch_checkpoint, args.device)
        n = precompute_masks(args.overhead_dir, args.out_dir, segmenter=seg, minmax=True)
    else:
        n = precompute_masks(args.overhead_dir, args.out_dir)
    print(f"wrote {n} masked tiles")


if __name__ == "__main__":
    main()
