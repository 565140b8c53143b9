"""Chord distance after orientation alignment — streaming (crop-free) form.

The reference materializes a [Bo, Bs, c, h, s_w] tensor by tiling every
overhead feature map per query, rolling each copy to its estimated
orientation, cropping, L2-normalizing and taking an inner product (reference
model/cvig_fov.py:318-363). That is O(Bo*Bs*c*h*s_w) memory — the documented
eval scaling limit (SURVEY.md §7 "Eval memory").

Identity exploited here: the inner product of the aligned crop with the
surface map *is* the correlation value at the argmax shift, and the crop's
norm is a circular sliding-window sum of the overhead map's per-column
squared norms. So with corr [Bo, Bs, W] already computed:

    <crop(bo, bs), s(bs)>  = max_i corr[bo, bs, i]
    ||crop(bo, bs)||^2     = wsum[bo, orientation(bo, bs)]
    d = 2 * (1 - corr_max / (||crop|| * ||s||))

which needs O(Bo*Bs) extra memory and no gather of feature maps at all.
Gradients flow through corr_max and the window norms exactly as they flow
through the reference's cropped gather (argmax itself carries no gradient in
either formulation).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def window_sq_norms(overhead_embed: jax.Array, window: int) -> jax.Array:
    """Squared L2 norm of every circular width-window of each overhead map.

    overhead_embed: [Bo, h, W, c]. Returns [Bo, W] where entry (b, i) is
    sum_{c,h} sum_{k<window} o[b, h, (i+k) % W, c]^2.
    """
    o = overhead_embed.astype(jnp.float32)
    col_sq = jnp.sum(o * o, axis=(1, 3))  # [Bo, W]
    w = col_sq.shape[-1]
    assert window <= w, (window, w)  # wider windows would clamp the gather
    if window == w:
        return jnp.sum(col_sq, axis=-1, keepdims=True) * jnp.ones((1, w))
    ext = jnp.concatenate([col_sq, col_sq[:, : window - 1]], axis=-1)
    csum = jnp.cumsum(ext, axis=-1)
    zero = jnp.zeros_like(csum[:, :1])
    csum = jnp.concatenate([zero, csum], axis=-1)  # prefix sums
    return csum[:, window : window + w] - csum[:, :w]


def chord_distance(
    overhead_embed: jax.Array,
    surface_embed: jax.Array,
    corr: jax.Array,
) -> Tuple[jax.Array, jax.Array]:
    """Chord distance 2*(1-cos) between each surface map and each overhead map
    aligned at its estimated orientation (streaming form of reference
    cvig_fov.py:318-363).

    Returns (distance [Bo, Bs], orientation int32 [Bo, Bs]).
    """
    sw = surface_embed.shape[2]
    orientation = jnp.argmax(corr, axis=-1).astype(jnp.int32)  # [Bo, Bs]
    corr_max = jnp.max(corr, axis=-1)  # [Bo, Bs]; value at argmax

    wsq = window_sq_norms(overhead_embed, sw)  # [Bo, W]
    crop_norm = jnp.sqrt(jnp.take_along_axis(wsq, orientation, axis=1))
    s = surface_embed.astype(jnp.float32)
    s_norm = jnp.sqrt(jnp.sum(s * s, axis=(1, 2, 3)))  # [Bs]

    # Degenerate all-zero windows/queries must yield a finite distance (2.0),
    # not NaN gradients poisoning the train step — same contract as the
    # serving kernel's guards (match/fft_matcher.chord_scores); the clamps
    # are inert for any non-degenerate input.
    cos = corr_max / (jnp.maximum(crop_norm, 1e-10) *
                      jnp.maximum(s_norm, 1e-10)[None, :])
    return 2.0 * (1.0 - cos), orientation


def paired_chord_distance(
    overhead_embed: jax.Array,
    surface_embed: jax.Array,
    method: str = "matmul",
) -> Tuple[jax.Array, jax.Array]:
    """Chord distance of matching pairs only (diagonal): overhead[i] vs
    surface[i]. O(B) — used to get each query's true-match distance before the
    blockwise gallery sweep. Returns (distance [B], orientation [B])."""
    o = overhead_embed.astype(jnp.float32)
    s = surface_embed.astype(jnp.float32)
    b, h, w, c = o.shape
    sw = s.shape[2]
    assert sw <= w, (sw, w)  # mirror circular_correlation's guard
    ext = jnp.concatenate([o, o[:, :, : sw - 1, :]], axis=2) if sw > 1 else o
    idx = jnp.arange(w)[:, None] + jnp.arange(sw)[None, :]
    windows = ext[:, :, idx, :]  # [B, h, W, s_w, c]
    corr = jnp.einsum(
        "bhwkc,bhkc->bw", windows, s, precision=jax.lax.Precision.HIGHEST
    )
    orientation = jnp.argmax(corr, axis=-1).astype(jnp.int32)
    corr_max = jnp.max(corr, axis=-1)
    wsq = window_sq_norms(o, sw)
    crop_norm = jnp.sqrt(jnp.take_along_axis(wsq, orientation[:, None], axis=1))[:, 0]
    s_norm = jnp.sqrt(jnp.sum(s * s, axis=(1, 2, 3)))
    cos = corr_max / jnp.maximum(crop_norm * s_norm, 1e-20)
    return 2.0 * (1.0 - cos), orientation


def paired_chord_distance_fft(
    overhead_embed: jax.Array,
    surface_embed: jax.Array,
) -> Tuple[jax.Array, jax.Array]:
    """FFT form of :func:`paired_chord_distance`: O(N * W log W) compute and
    O(N * h * W * c) memory — no circular-window materialization. Kept as
    the independent-arithmetic oracle cross-check in tests; the evaluator's
    true-match pass computes its threshold through match/fft_matcher
    (query_fft + chord_scores) instead, the SAME kernel arithmetic as its
    gallery sweep (see evaluation/gallery._paired_distance_batched)."""
    o = overhead_embed.astype(jnp.float32)
    s = surface_embed.astype(jnp.float32)
    w = o.shape[2]
    sw = s.shape[2]
    assert sw <= w, (sw, w)  # mirror circular_correlation's guard
    s_pad = jnp.pad(s, ((0, 0), (0, 0), (0, w - sw), (0, 0))) if sw < w else s
    fo = jnp.fft.rfft(o, axis=2)
    fs = jnp.fft.rfft(s_pad, axis=2)
    prod = jnp.einsum(
        "bhfc,bhfc->bf", fo, jnp.conj(fs), precision=jax.lax.Precision.HIGHEST
    )
    corr = jnp.fft.irfft(prod, n=w, axis=-1)  # [B, W]
    orientation = jnp.argmax(corr, axis=-1).astype(jnp.int32)
    corr_max = jnp.max(corr, axis=-1)
    wsq = window_sq_norms(o, sw)
    crop_norm = jnp.sqrt(jnp.take_along_axis(wsq, orientation[:, None], axis=1))[:, 0]
    s_norm = jnp.sqrt(jnp.sum(s * s, axis=(1, 2, 3)))
    cos = corr_max / jnp.maximum(crop_norm * s_norm, 1e-20)
    return 2.0 * (1.0 - cos), orientation


def match_scores(distances: jax.Array, temperature: float = 10.0) -> jax.Array:
    """Heatmap similarity score from chord distance: exp(t * (1 - d))
    (reference tools/heatmap/heatmap.py:177)."""
    return jnp.exp(temperature * (1.0 - distances))
