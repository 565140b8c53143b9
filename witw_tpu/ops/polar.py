"""On-device polar transform (Shi et al., "Where Am I Looking At?", CVPR 2020).

The reference computes this per sample on CPU inside DataLoader workers with a
NumPy gather + 4-corner bilinear blend (reference model/cvig_fov.py:156-209) —
its main input-pipeline bottleneck (SURVEY.md §2.1). Here the sampling grid is
precomputed once per static geometry and the transform is a batched gather +
weighted sum that XLA fuses into the forward pass; raw 256x256 tiles are
shipped to the device instead of 128x512 polar maps, so host->device traffic
also shrinks.

Grid (reference cvig_fov.py:198-201): output pixel (x, y) of the h_s x w_s
pseudo-panorama samples the s_o x s_o overhead tile at

    row = s_o/2 + s_o/2 * (h_s-1-y)/h_s * cos(2*pi*x/w_s)
    col = s_o/2 - s_o/2 * (h_s-1-y)/h_s * sin(2*pi*x/w_s)

with bilinear interpolation whose four corner indices are clipped to the valid
range BEFORE the weights are computed (reference cvig_fov.py:163-183) — at
exact-boundary samples (e.g. row = s_o - 1 at y=0, x=0) all weights collapse
to 0 and the reference emits 0, not the border pixel; reproduced here.
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class PolarGrid(NamedTuple):
    """Precomputed flat gather indices and bilinear weights.

    idx: int32 [4, h_s*w_s] flat indices into a flattened (s_o*s_o) tile.
    weight: float32 [4, h_s*w_s] matching bilinear corner weights.
    wsum: float32 [h_s, w_s] per-pixel weight sum — exactly 1 in the interior
        and 0 at exact-boundary samples (where the reference's clip-then-weight
        order zeroes the output). Users that normalize AFTER the transform
        multiply by this mask post-normalization to stay bit-equal to the
        reference's normalize-then-polar order.
    """

    idx: np.ndarray
    weight: np.ndarray
    wsum: np.ndarray
    out_hw: Tuple[int, int]


@functools.lru_cache(maxsize=8)
def polar_grid(
    surface_height: int = 128,
    surface_width: int = 512,
    overhead_size: int = 256,
) -> PolarGrid:
    h_s, w_s, s_o = surface_height, surface_width, overhead_size
    xx, yy = np.meshgrid(np.arange(w_s), np.arange(h_s))
    radius = (s_o / 2.0) * (h_s - 1 - yy) / h_s
    row = (s_o / 2.0) + radius * np.cos(2.0 * math.pi * xx / w_s)
    col = (s_o / 2.0) - radius * np.sin(2.0 * math.pi * xx / w_s)

    r0 = np.floor(row).astype(np.int64)
    r1 = r0 + 1
    c0 = np.floor(col).astype(np.int64)
    c1 = c0 + 1
    # Reference order (cvig_fov.py:168-183): clip the corner indices FIRST,
    # then compute weights from the clipped values. At exact-boundary samples
    # the weights all vanish and the output is 0 (not the border pixel).
    r0c = np.clip(r0, 0, s_o - 1)
    r1c = np.clip(r1, 0, s_o - 1)
    c0c = np.clip(c0, 0, s_o - 1)
    c1c = np.clip(c1, 0, s_o - 1)
    w_r0 = r1c - row
    w_r1 = row - r0c
    w_c0 = c1c - col
    w_c1 = col - c0c

    idx = np.stack(
        [
            (r0c * s_o + c0c).reshape(-1),
            (r1c * s_o + c0c).reshape(-1),
            (r0c * s_o + c1c).reshape(-1),
            (r1c * s_o + c1c).reshape(-1),
        ]
    ).astype(np.int32)
    weight = np.stack(
        [
            (w_c0 * w_r0).reshape(-1),
            (w_c0 * w_r1).reshape(-1),
            (w_c1 * w_r0).reshape(-1),
            (w_c1 * w_r1).reshape(-1),
        ]
    ).astype(np.float32)
    # (w_r0+w_r1)(w_c0+w_c1) = (r1c-r0c)(c1c-c0c) in {0, 1}: 0 exactly where
    # both corners clipped to the same index (boundary sample).
    wsum = ((r1c - r0c) * (c1c - c0c)).astype(np.float32)
    return PolarGrid(idx=idx, weight=weight, wsum=wsum, out_hw=(h_s, w_s))


def polar_transform(
    overhead: jax.Array,
    surface_height: int = 128,
    surface_width: int = 512,
    gather_dtype: jnp.dtype = jnp.float32,
) -> jax.Array:
    """Polar-map a batch of square overhead tiles to pseudo-panoramas.

    overhead: [B, S, S, C] (NHWC) or [S, S, C]. Returns [B, h_s, w_s, C]
    float32.

    ``gather_dtype=bfloat16`` halves the gather's HBM traffic (the hot part of
    this op on TPU). It is exact for raw uint8-valued tiles (bf16 represents
    integers <= 256 exactly); call the transform *before* normalization in
    that case — bilinear weights sum to 1 in the interior, so the per-channel
    affine normalization commutes with the transform there. At the few
    exact-boundary pixels the weight sum is 0 (reference clip-then-weight
    semantics); multiply the normalized result by ``polar_grid(...).wsum`` to
    zero them, which restores exact equality with normalize-then-polar.
    """
    squeeze = overhead.ndim == 3
    if squeeze:
        overhead = overhead[None]
    b, s, s2, c = overhead.shape
    assert s == s2, f"overhead tile must be square, got {overhead.shape}"
    grid = polar_grid(surface_height, surface_width, s)
    idx = jnp.asarray(grid.idx)
    weight = jnp.asarray(grid.weight)

    flat = overhead.reshape(b, s * s, c).astype(gather_dtype)
    # Gather the four corners for every output pixel: [B, 4, h*w, C].
    corners = flat[:, idx, :]
    out = jnp.einsum("bkpc,kp->bpc", corners.astype(jnp.float32), weight)
    out = out.reshape(b, *grid.out_hw, c)
    if squeeze:
        out = out[0]
    return out
