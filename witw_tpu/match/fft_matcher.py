"""The ONE FFT correlation + chord-distance kernel (VERDICT r2 weak #8).

Every gallery-scale matcher — the rank evaluator (evaluation/gallery.py),
the serving index's chunked search / per-query rerank (evaluation/index.py),
and through them the heatmap sweep (tools/heatmap.py) — computes the same
thing: circular width-correlation of overhead feature maps against query
maps via rFFT (mathematically equal to the reference's conv2d trick,
model/cvig_fov.py:297-315), argmax orientation, and the streaming crop-free
chord distance 2*(1-cos) (cvig_fov.py:318-363; see match/distance.py for the
identity). This module is the single implementation; callers differ only in
which batch axes the correlation einsum pairs.

All functions are pure and trace-time (jit/shard_map-composable).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def query_fft(s: jax.Array, w: int) -> Tuple[jax.Array, jax.Array]:
    """Query maps [Q, h, sw, c] -> (rFFT of the zero-padded maps
    [Q, h, wf, c], L2 norms [Q]) for gallery width ``w``."""
    s = s.astype(jnp.float32)
    sw = s.shape[2]
    assert sw <= w, (sw, w)  # mirror circular_correlation's guard: a query
    # wider than the gallery would otherwise surface as an opaque einsum
    # shape error deep inside _freq_product
    s_pad = jnp.pad(s, ((0, 0), (0, 0), (0, w - sw), (0, 0))) if sw < w else s
    fs = jnp.fft.rfft(s_pad, axis=2)
    s_norm = jnp.sqrt(jnp.sum(s * s, axis=(1, 2, 3)))
    return fs, s_norm


def chord_scores(
    corr: jax.Array, wsq: jax.Array, s_norm: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """Distances + orientations from correlation values.

    corr: [..., w] circular correlation along width; wsq: window squared
    norms, broadcastable to corr; s_norm: query norms, broadcastable to
    corr[..., 0]. Orientation is the argmax of the UNNORMALIZED correlation
    (reference cvig_fov.py:312-313); the chord distance normalizes its value
    by the crop norm at that shift and the query norm."""
    corr_max = jnp.max(corr, axis=-1)
    orient = jnp.argmax(corr, axis=-1)
    # wsq at the argmax shift via a one-hot masked sum, NOT take_along_axis:
    # XLA:TPU lowers the gather scalarized (measured 1.38 ms per [1024, 128]
    # block — 64% of the whole eval sweep's device time, exp/r4_eval_roofline
    # trace), while compare+select+reduce fuses into one vectorized pass.
    # Bitwise identical: argmax yields exactly one index, so exactly one
    # summand is nonzero.
    iota = jax.lax.broadcasted_iota(jnp.int32, corr.shape, corr.ndim - 1)
    wsq_at = jnp.sum(
        jnp.where(
            iota == orient[..., None], jnp.broadcast_to(wsq, corr.shape), 0.0
        ),
        axis=-1,
    )
    cos = corr_max * jax.lax.rsqrt(jnp.maximum(wsq_at, 1e-20)) / jnp.maximum(
        s_norm, 1e-10
    )
    return 2.0 * (1.0 - cos), orient


def _freq_product(fo: jax.Array, fs: jax.Array, sub: str, fast: bool):
    """The correlation's frequency-domain product ``einsum(sub, fo, conj(fs))``
    contracted over (h, c) with f as a batch axis. Returns the real and
    imaginary parts as a ``(re, im)`` TUPLE.

    Both paths use the stacked-real formulation — Re = [Re fo; Im fo].[Re fs;
    Im fs], Im = [Im fo; -Re fo].[Re fs; Im fs] (the conj folds into the
    signs) — rather than a complex einsum: a complex64 product forces
    real/imag-extraction layout copies feeding the inverse-DFT matmuls
    (two [1024, 128, 33] copies per sweep block in the r4 trace); computing
    the parts directly dropped the 8832^2 eval sweep 0.275 -> 0.217 s warm
    with rank agreement 1.0000 (exp/r5_eval_layout.py, VERDICT r4 #6).

    Exact mode runs the doubled-contraction einsums in f32 at HIGHEST
    precision — same arithmetic count as the complex product (which is four
    real matmuls), differing only in f32 summation order. ``fast`` casts the
    operands to bf16 with f32 accumulation (~2x MXU rate) — an
    approximation: near-threshold ranks and near-tie argmax orientations can
    flip (rank agreement on planted-structure data is test-gated, like the
    int8 serving path)."""
    c_ax = fo.ndim - 1  # the trailing contraction axis (c)
    fo_re, fo_im = jnp.real(fo), jnp.imag(fo)
    fs_cat = jnp.concatenate([jnp.real(fs), jnp.imag(fs)], axis=fs.ndim - 1)
    fo_re_cat = jnp.concatenate([fo_re, fo_im], axis=c_ax)
    fo_im_cat = jnp.concatenate([fo_im, -fo_re], axis=c_ax)
    if fast:
        fs_cat = fs_cat.astype(jnp.bfloat16)
        re = jnp.einsum(sub, fo_re_cat.astype(jnp.bfloat16), fs_cat,
                        preferred_element_type=jnp.float32)
        im = jnp.einsum(sub, fo_im_cat.astype(jnp.bfloat16), fs_cat,
                        preferred_element_type=jnp.float32)
        return re, im
    hp = jax.lax.Precision.HIGHEST
    re = jnp.einsum(sub, fo_re_cat, fs_cat, precision=hp)
    im = jnp.einsum(sub, fo_im_cat, fs_cat, precision=hp)
    return re, im


@functools.lru_cache(maxsize=8)
def _irdft_mats(w: int) -> Tuple[np.ndarray, np.ndarray]:
    """Inverse-rDFT matrices (f64-built, f32-cast): for Hermitian rFFT
    coefficients P[..., wf], irfft(P, n=w) == Re(P) @ C + Im(P) @ S with
    C[f, n] = m_f cos(2pi f n / w) / w, S[f, n] = -m_f sin(2pi f n / w) / w,
    m_0 = m_{w/2} = 1 and m_f = 2 otherwise (the Hermitian double-count)."""
    f = np.arange(w // 2 + 1, dtype=np.float64)
    n = np.arange(w, dtype=np.float64)
    ang = 2.0 * np.pi * np.outer(f, n) / w
    scale = np.full(w // 2 + 1, 2.0)
    scale[0] = 1.0
    if w % 2 == 0:
        scale[-1] = 1.0
    c = np.cos(ang) * scale[:, None] / w
    s = -np.sin(ang) * scale[:, None] / w
    return c.astype(np.float32), s.astype(np.float32)


def _irfft_small(prod, w: int) -> jax.Array:
    """Inverse rFFT along the last axis of a ``(re, im)`` frequency product
    as ONE real matmul against the [C; S]-stacked inverse-DFT matrices —
    numerically equivalent to jnp.fft.irfft at f32 roundoff, and much faster
    than XLA's irfft custom call at the matcher's tiny widths (w=64): the
    custom call forces layout copies in/out on every sweep step (~300 of
    500 ms of the 8832^2 eval sweep's device time; exp/r4_eval_roofline
    trace), while the matmul form fuses into the einsum pipeline. Stacking
    re/im into a single doubled-K matmul (rather than two matmuls + add)
    rode in with the stacked-real product (exp/r5_eval_layout.py)."""
    re, im = prod
    c, s = _irdft_mats(w)
    cs = jnp.concatenate([c, s], axis=0)  # [2*wf, w]
    stack = jnp.concatenate([re, im], axis=-1)  # [..., 2*wf]
    return jnp.einsum("...f,fn->...n", stack, cs,
                      precision=jax.lax.Precision.HIGHEST)


def gallery_vs_queries(
    fo: jax.Array, wsq: jax.Array, fs: jax.Array, s_norm: jax.Array, w: int,
    fast: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """All-pairs form: gallery FFTs [G, h, wf, c] x query FFTs [Q, h, wf, c]
    -> (distances [G, Q], orientations [G, Q]). wsq: [G, w], s_norm: [Q].
    ``fast``: bf16 frequency product (see _freq_product)."""
    prod = _freq_product(fo, fs, "ghfc,qhfc->gqf", fast)
    corr = _irfft_small(prod, w)  # [G, Q, w]
    return chord_scores(corr, wsq[:, None, :], s_norm[None, :])


def candidates_vs_queries(
    fo: jax.Array, wsq: jax.Array, fs: jax.Array, s_norm: jax.Array, w: int,
    fast: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Per-query candidate form: each query q against ITS OWN M candidates.
    fo: [Q, M, h, wf, c], wsq: [Q, M, w], fs: [Q, h, wf, c], s_norm: [Q]
    -> (distances [Q, M], orientations [Q, M])."""
    prod = _freq_product(fo, fs, "qmhfc,qhfc->qmf", fast)
    corr = _irfft_small(prod, w)  # [Q, M, w]
    return chord_scores(corr, wsq, s_norm[:, None])
