"""Pallas TPU kernel: fused circular correlation + orientation-aligned chord
distance.

The gallery-sweep hot loop (reference model/cvig_fov.py:544-552 re-runs
conv2d + roll-gather per query) reduces to, per (overhead g, query q):

    corr[q, i] = sum_k <o_g[(i+k) mod W], s_q[k]>        (circular correlation)
    d[g, q]    = 2 * (1 - max_i corr / (win_norm[g, argmax] * ||s_q||))

This kernel fuses the whole chain for a block of G overhead maps against a
block of Q queries in VMEM:

1. accumulate corr[Q, W] over the sw surface columns: each step is one MXU
   GEMM  s_k [Q, hc] x rot_k(O_g) [W, hc]^T  where rot_k is a circular
   rotation of the overhead map along width (tpu.dynamic_rotate via
   pltpu.roll) — no circular-window matrix is ever materialized,
2. max/argmax over W, one-hot gather of the window norm, distance (VPU),
3. write only d[g_blk, Q] and orient[g_blk, Q] — the [G, Q, W] correlation
   tensor never touches HBM.

Used for inference/eval (no backward); training uses the XLA path in
witw_tpu.match (differentiable). Numerics: float32 accumulation.

Layout: o_flat [G, W, hc], s_swqh [sw, Q, hc] where hc = h*c (feature-map
height folded into channels; the correlation contracts h and c jointly and
width stays the circular axis).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _make_kernel(g_blk: int, w: int, hc: int, q: int, sw: int):
    def kernel(o_ref, s_ref, wsq_ref, out_d_ref, out_or_ref):
        """o_ref: [G_BLK, W, hc]; s_ref: [sw, Q, hc]; wsq_ref: [G_BLK, W];
        outputs [G_BLK, Q]."""
        s_norm_sq = jnp.zeros((q,), jnp.float32)
        for k in range(sw):
            s_k = s_ref[k]
            s_norm_sq = s_norm_sq + jnp.sum(s_k * s_k, axis=-1)
        s_norm = jnp.sqrt(s_norm_sq)  # [Q]

        for g in range(g_blk):
            o = o_ref[g]  # [W, hc]

            def body(k, corr):
                # positive-shift form of roll(o, -k): row i -> o[(i+k) mod W]
                o_rot = pltpu.roll(o, (w - k) % w, 0)
                s_k = s_ref[k]  # [Q, hc]
                return corr + jax.lax.dot_general(
                    s_k, o_rot,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )

            corr = jax.lax.fori_loop(
                0, sw, body, jnp.zeros((q, w), jnp.float32)
            )  # [Q, W]

            corr_max = jnp.max(corr, axis=-1)  # [Q]
            orient = jnp.argmax(corr, axis=-1)  # [Q]
            wsq = wsq_ref[g]  # [W]
            onehot = (
                jax.lax.broadcasted_iota(jnp.int32, (q, w), 1) == orient[:, None]
            ).astype(jnp.float32)
            wsq_at = jnp.sum(onehot * wsq[None, :], axis=-1)  # [Q]
            cos = corr_max * jax.lax.rsqrt(jnp.maximum(wsq_at, 1e-20)) / jnp.maximum(
                s_norm, 1e-10
            )
            out_d_ref[g, :] = 2.0 * (1.0 - cos)
            out_or_ref[g, :] = orient.astype(jnp.int32)

    return kernel


@functools.partial(jax.jit, static_argnames=("g_blk", "interpret"))
def fused_corr_distance(
    o_flat: jax.Array,
    s_swqh: jax.Array,
    wsq: jax.Array,
    g_blk: int = 8,
    interpret: bool = False,
):
    """Fused chord distance for a gallery block vs a query block.

    o_flat: [G, W, hc] float32 (G divisible by g_blk)
    s_swqh: [sw, Q, hc] float32 (queries laid out column-major over width)
    wsq:    [G, W] squared circular-window norms (witw_tpu.match.window_sq_norms)
    Returns (d [G, Q] float32, orient [G, Q] int32).
    """
    g, w, hc = o_flat.shape
    sw, q, _ = s_swqh.shape
    assert g % g_blk == 0, (g, g_blk)
    grid = (g // g_blk,)

    return pl.pallas_call(
        _make_kernel(g_blk, w, hc, q, sw),
        grid=grid,
        in_specs=[
            pl.BlockSpec((g_blk, w, hc), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((sw, q, hc), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((g_blk, w), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((g_blk, q), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((g_blk, q), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((g, q), jnp.float32),
            jax.ShapeDtypeStruct((g, q), jnp.int32),
        ],
        interpret=interpret,
    )(o_flat.astype(jnp.float32), s_swqh.astype(jnp.float32), wsq.astype(jnp.float32))


def fused_chord_distance_nhwc(
    overhead_embed: jax.Array,
    surface_embed: jax.Array,
    g_blk: int = 8,
    interpret: bool = False,
):
    """NHWC wrapper: [G, h, W, c] x [Q, h, sw, c] -> (d [G, Q], orient [G, Q]).

    Folds h into the channel dim and pads G to a g_blk multiple.
    """
    from witw_tpu.match.distance import window_sq_norms

    if jax.default_backend() == "cpu":
        interpret = True  # compiled Mosaic kernels are TPU-only
    g, h, w, c = overhead_embed.shape
    q, _, sw, _ = surface_embed.shape
    o_flat = jnp.transpose(overhead_embed, (0, 2, 1, 3)).reshape(g, w, h * c)
    s_swqh = jnp.transpose(surface_embed, (2, 0, 1, 3)).reshape(sw, q, h * c)
    wsq = window_sq_norms(overhead_embed, sw)
    pad = (-g) % g_blk
    if pad:
        o_flat = jnp.pad(o_flat, ((0, pad), (0, 0), (0, 0)))
        wsq = jnp.pad(wsq, ((0, pad), (0, 0)), constant_values=1.0)
    d, orient = fused_corr_distance(o_flat, s_swqh, wsq, g_blk=g_blk, interpret=interpret)
    return d[:g], orient[:g]
