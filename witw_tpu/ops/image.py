"""On-device image ops: normalization and resize.

The reference runs these per-sample on CPU inside DataLoader workers
(reference model/cvig_fov.py:137-154 ImageNormalization; :100-134 Resize).
Here they are jit-friendly batched NHWC ops that fuse into the forward pass.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp


def normalize_images(
    x: jax.Array,
    mean: Sequence[float],
    std: Sequence[float],
    scale_channels: int | None = None,
) -> jax.Array:
    """Scale to [0,1] and standardize per channel. NHWC.

    ``scale_channels`` limits the /255 scaling to the first k channels: the
    semantic variant divides only RGB by 255 while the extra mask channels are
    standardized raw (reference cvig_semantic.py:173-176 — a quirk of the
    reference that we reproduce for parity).
    """
    x = jnp.asarray(x, jnp.float32)
    c = x.shape[-1]
    if scale_channels is None:
        scale_channels = c
    scale = jnp.where(jnp.arange(c) < scale_channels, 1.0 / 255.0, 1.0)
    mean_arr = jnp.asarray(mean, jnp.float32)
    std_arr = jnp.asarray(std, jnp.float32)
    return (x * scale - mean_arr) / std_arr


def normalize_images_masked_bias(
    x: jax.Array,
    mean: Sequence[float],
    std: Sequence[float],
    bias_mask: jax.Array,
    scale_channels: int | None = None,
) -> jax.Array:
    """normalize_images with the additive term gated by a per-pixel mask:
    ``x*k + b*mask`` instead of ``(x*k + b)*mask``.

    Used by the polar-before-normalize path: at exact-boundary polar samples
    the gather weights are all zero (clip-then-weight, ops/polar.py), so the
    multiplicative part is already 0 there — only the normalization bias must
    be masked to equal reference normalize-then-polar exactly. Folding the
    mask into a precomputed bias map makes the whole correction one fused
    multiply-add (a separate post-normalize mask multiply cost ~5% of the
    embed+match step at CVUSA geometry).

    bias_mask: [H, W] (or broadcastable) 0/1 float mask.
    """
    x = jnp.asarray(x, jnp.float32)
    c = x.shape[-1]
    if scale_channels is None:
        scale_channels = c
    scale = jnp.where(jnp.arange(c) < scale_channels, 1.0 / 255.0, 1.0)
    mean_arr = jnp.asarray(mean, jnp.float32)
    std_arr = jnp.asarray(std, jnp.float32)
    k = scale / std_arr
    b = -mean_arr / std_arr
    b_map = jnp.asarray(bias_mask, jnp.float32)[..., None] * b  # [H, W, C]
    return x * k + b_map


def denormalize_images(
    x: jax.Array, mean: Sequence[float], std: Sequence[float]
) -> jax.Array:
    """Inverse of the standardization step (reference cvig_fov.py:151-154)."""
    mean_arr = jnp.asarray(mean, jnp.float32)
    std_arr = jnp.asarray(std, jnp.float32)
    return x * std_arr + mean_arr


def resize_bilinear(x: jax.Array, height: int, width: int) -> jax.Array:
    """Bilinear resize with half-pixel centers and no antialiasing.

    Matches torchvision's ``functional.resize`` (align_corners=False, no
    antialias — torchvision 0.9 behavior used throughout the reference, e.g.
    cvig_fov.py:119,133). Accepts NHWC batches or HWC single images.
    """
    if x.ndim == 3:
        shape = (height, width, x.shape[-1])
    elif x.ndim == 4:
        shape = (x.shape[0], height, width, x.shape[-1])
    else:
        raise ValueError(f"expected HWC or NHWC, got shape {x.shape}")
    orig_dtype = x.dtype
    out = jax.image.resize(
        x.astype(jnp.float32), shape, method="linear", antialias=False
    )
    if jnp.issubdtype(orig_dtype, jnp.floating):
        out = out.astype(orig_dtype)
    return out


def repeat_rows(x: jax.Array, repeats: int = 2) -> jax.Array:
    """Repeat rows (H axis) — baseline CVUSA surface resize
    (reference cvig_baseline.py:216-218). NHWC or HWC."""
    axis = x.ndim - 3
    return jnp.repeat(x, repeats, axis=axis)
