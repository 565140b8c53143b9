"""Circular cross-correlation over the width (orientation) axis.

The reference estimates the relative orientation of every (overhead, surface)
pair by circularly cross-correlating their spatial feature maps along width:
it appends the first s_w-1 columns of the overhead map to its end and runs a
`conv2d` with the surface batch as the filter bank (reference
model/cvig_fov.py:297-315):

    corr[bo, bs, i] = sum_{c,h,k} o[bo, c, h, (i+k) mod W] * s[bs, c, h, k]

Two TPU-native implementations, numerically equal:

- ``matmul``: materialize the W circular windows of the overhead map once per
  overhead sample and contract (c, h, s_w) in a single fat GEMM on the MXU —
  [Bo*W, d] x [d, Bs] with d = c*h*s_w. Exact; preferred at feature-map scale
  (W = 64).
- ``fft``: rFFT along width, batched complex einsum over (c, h), inverse rFFT:
  irfft(rfft(o) * conj(rfft(s_padded))). O(W log W) per position; preferred
  for very wide maps.

Layout is NHWC: feature maps are [B, h, w, c].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def circular_correlation(
    overhead_embed: jax.Array,
    surface_embed: jax.Array,
    method: str = "matmul",
    precision=jax.lax.Precision.HIGHEST,
) -> jax.Array:
    """Full circular cross-correlation.

    overhead_embed: [Bo, h, W, c]; surface_embed: [Bs, h, s_w, c] with
    s_w <= W. Returns corr [Bo, Bs, W] (float32).
    """
    bo, h, w, c = overhead_embed.shape
    bs, sh, sw, sc = surface_embed.shape
    assert sh == h and sc == c, (overhead_embed.shape, surface_embed.shape)
    assert sw <= w, f"surface width {sw} exceeds overhead width {w}"
    o = overhead_embed.astype(jnp.float32)
    s = surface_embed.astype(jnp.float32)

    if method == "matmul":
        # Circular windows: ext[:, :, i, k, :] = o[:, :, (i+k) % W, :].
        ext = jnp.concatenate([o, o[:, :, : sw - 1, :]], axis=2) if sw > 1 else o
        idx = (jnp.arange(w)[:, None] + jnp.arange(sw)[None, :])  # [W, s_w]
        windows = ext[:, :, idx, :]  # [Bo, h, W, s_w, c]
        return jnp.einsum(
            "ahwkc,bhkc->abw", windows, s, precision=precision
        )
    elif method == "fft":
        if sw < w:
            s = jnp.pad(s, ((0, 0), (0, 0), (0, w - sw), (0, 0)))
        fo = jnp.fft.rfft(o, axis=2)  # [Bo, h, Wf, c]
        fs = jnp.fft.rfft(s, axis=2)  # [Bs, h, Wf, c]
        prod = jnp.einsum("ahfc,bhfc->abf", fo, jnp.conj(fs), precision=precision)
        return jnp.fft.irfft(prod, n=w, axis=-1)
    else:
        raise ValueError(f"unknown correlation method: {method}")


def orientation_estimate(corr: jax.Array) -> jax.Array:
    """Argmax over width = estimated relative orientation per pair
    (reference cvig_fov.py:312-313). corr: [Bo, Bs, W] -> int32 [Bo, Bs]."""
    return jnp.argmax(corr, axis=-1).astype(jnp.int32)
