#!/usr/bin/env python
"""Fused VGG block-2 int8 Pallas kernel: conv2_1 + conv2_2 + maxpool2 in one
pass, conv2_1's activation resident in VMEM (never touches HBM).

Layout: width-parity packing. The C=64 input [B, H, W, 64] is padded (rows +-2
zero; cols +4 left / +28 right, zero or wrap) and lane-merged to
[B, H+4, 144, 128] where lanes = (w parity, c) — a contiguous reshape, cheap
on the XLA side, and the 128-lane form Mosaic's DMA requires. Inside the
kernel, even/odd output columns are two patch matmuls over lane-half slices;
maxpool's width pairing is then a pointwise max(even, odd) and its height
pairing a sublane reshape-max. All per-parity slice lengths are 8-aligned
(136 for conv2_1, 128 for conv2_2) — Mosaic rejects odd-length lane-64
shape casts.

Pair q holds original columns (2q-4, 2q-3). conv2_1 computes y1 rows
j in [0,66) = orig j-1, even cols orig 2q-4 and odd 2q-3 for q in [1,137).
"""

import functools
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

H, W = 64, 256
PAIRS = 144             # packed input pair count (cols -4 .. 283)
QN = 136                # per-parity conv2_1 output count (q in [1, 137))
NROWS = H + 2           # conv2_1 rows computed (orig -1 .. H)
C1, C2 = 64, 128


def _kernel(p_ref, w1_ref, b1_ref, m1_ref, w2_ref, b2_ref, m2_ref, out_ref,
            y1_ref, *, circular, r1, r2, skip1=False, skip2=False):
    lo, hi = (0, 64), (64, 128)

    # ---- stage 1: conv2_1 -> packed y1 scratch ----
    for j0 in [] if skip1 else range(0, NROWS, r1):
        rj = min(r1, NROWS - j0)
        parts = []
        for taps in (
            ((0, hi), (1, lo), (1, hi)),    # even cols
            ((1, lo), (1, hi), (2, lo)),    # odd cols
        ):
            cols = []
            for dy in range(3):
                for (qa, lane) in taps:
                    sl = p_ref[0, j0 + dy : j0 + dy + rj, qa : qa + QN,
                               lane[0] : lane[1]]
                    cols.append(sl.reshape(rj * QN, 64))
            parts.append(jnp.concatenate(cols, axis=1))
        patch = jnp.concatenate(parts, axis=0)  # [2*rj*QN, 576]
        acc = jnp.dot(patch, w1_ref[:], preferred_element_type=jnp.int32)
        acc = acc + b1_ref[:]
        y = jnp.clip(jnp.round(acc.astype(jnp.float32) * m1_ref[:]), 0., 127.)
        y = y.astype(jnp.int8)
        mq = rj * QN
        y1_ref[j0 : j0 + rj, 1 : 1 + QN, 0:128] = y[:mq].reshape(rj, QN, 128)
        y1_ref[j0 : j0 + rj, 1 : 1 + QN, 128:256] = y[mq:].reshape(rj, QN, 128)
    # ---- halo masking ----
    y1_ref[0:1] = jnp.zeros((1, PAIRS, 256), jnp.int8)
    y1_ref[NROWS - 1 : NROWS] = jnp.zeros((1, PAIRS, 256), jnp.int8)
    if not circular:
        # orig col -1 (odd, q=1) and col W (even, q=130) are zero pads
        y1_ref[:, 1:2, 192:256] = jnp.zeros((NROWS, 1, 64), jnp.int8)
        y1_ref[:, 1:2, 128:192] = jnp.zeros((NROWS, 1, 64), jnp.int8)
        y1_ref[:, 130:131, 0:64] = jnp.zeros((NROWS, 1, 64), jnp.int8)
        y1_ref[:, 130:131, 64:128] = jnp.zeros((NROWS, 1, 64), jnp.int8)

    # ---- stage 2: conv2_2 + maxpool2 ----
    U = W // 2
    el, eh = (0, 128), (128, 256)
    for k0 in [] if skip2 else range(0, H, r2):
        rk = min(r2, H - k0)
        parts = []
        for taps in (
            ((1, eh), (2, el), (2, eh)),  # even out cols w=2u
            ((2, el), (2, eh), (3, el)),  # odd out cols w=2u+1
        ):
            cols = []
            for dy in range(3):
                for (qa, lane) in taps:
                    sl = y1_ref[k0 + dy : k0 + dy + rk, qa : qa + U,
                                lane[0] : lane[1]]
                    cols.append(sl.reshape(rk * U, 128))
            parts.append(jnp.concatenate(cols, axis=1))
        patch = jnp.concatenate(parts, axis=0)  # [2*rk*U, 1152]
        acc = jnp.dot(patch, w2_ref[:], preferred_element_type=jnp.int32)
        acc = acc + b2_ref[:]
        z = jnp.clip(jnp.round(acc.astype(jnp.float32) * m2_ref[:]), 0., 127.)
        mu = rk * U
        zw = jnp.maximum(z[:mu], z[mu:])                     # pool width pair
        zh = jnp.max(zw.reshape(rk // 2, 2, U, C2), axis=1)  # pool height pair
        out_ref[0, k0 // 2 : (k0 + rk) // 2] = zh.astype(jnp.int8)
    if skip2:
        out_ref[0, 0:2] = jnp.zeros((2, W // 2, C2), jnp.int8)


@functools.partial(jax.jit, static_argnames=("circular", "r1", "r2", "skip1", "skip2"))
def fused_block2(x, w1, b1, m1, w2, b2, m2, circular=False, r1=11, r2=8,
                 skip1=False, skip2=False):
    """x: [B, H, W, 64] int8 (pool1 output). Returns [B, H/2, W/2, 128] int8
    (pool2 output). w1/w2: [3,3,64,128]/[3,3,128,128] int8; b: int32 [128];
    m: f32 [128] requant multipliers."""
    b = x.shape[0]
    xp = jnp.pad(x, ((0, 0), (2, 2), (0, 0), (0, 0)))
    xp = jnp.pad(xp, ((0, 0), (0, 0), (4, 2 * PAIRS - W - 4), (0, 0)),
                 mode="wrap" if circular else "constant")
    xp = xp.reshape(b, H + 4, PAIRS, 128)
    kern = functools.partial(_kernel, circular=circular, r1=r1, r2=r2,
                             skip1=skip1, skip2=skip2)
    return pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, H + 4, PAIRS, 128), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
        out_specs=pl.BlockSpec(
            (1, H // 2, W // 2, C2), lambda i: (i, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, H // 2, W // 2, C2), jnp.int8),
        scratch_shapes=[
            pltpu.VMEM((NROWS, PAIRS, 256), jnp.int8),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 9 * (C1 * C2 + C2 * C2) * b * H * W,
            bytes_accessed=xp.size + b * (H // 2) * (W // 2) * C2,
            transcendentals=0,
        ),
    )(xp, w1.reshape(9 * C1, C2), b1.reshape(1, C2), m1.reshape(1, C2),
      w2.reshape(9 * C2, C2), b2.reshape(1, C2), m2.reshape(1, C2))


# ---- XLA oracle: same semantics as quantize.quantized_fov_forward_static ----
def xla_block2(x, w1, b1, m1, w2, b2, m2, circular=False):
    w_pad = (0, 0) if circular else (1, 1)
    h = x
    if circular:
        h = jnp.pad(h, ((0, 0), (0, 0), (2, 2), (0, 0)), mode="wrap")
    for wgt, bia, mul in ((w1, b1, m1), (w2, b2, m2)):
        acc = jax.lax.conv_general_dilated(
            h, wgt, (1, 1), ((1, 1), w_pad),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        ) + bia
        h = jnp.clip(jnp.round(acc.astype(jnp.float32) * mul), 0., 127.).astype(jnp.int8)
    return jax.lax.reduce_window(h, jnp.int8(-127), jax.lax.max,
                                 (1, 2, 2, 1), (1, 2, 2, 1), "VALID")


def scan_measure(fn, xscan, *args):
    @jax.jit
    def scanner(xscan, *a):
        def body(c, x):
            y = fn(x, *a)
            return c, jnp.sum(y.astype(jnp.int32) ** 2)
        _, o = jax.lax.scan(body, 0, xscan)
        return o

    np.asarray(scanner(xscan, *args))
    best = float("inf")
    for _ in range(3):
        t = time.perf_counter()
        np.asarray(scanner(xscan, *args))
        best = min(best, time.perf_counter() - t)
    return best


def main():
    rng = np.random.default_rng(0)
    B, STEPS = 64, 2
    w1 = jnp.asarray(rng.integers(-20, 21, (3, 3, C1, C2), dtype=np.int64).astype(np.int8))
    w2 = jnp.asarray(rng.integers(-20, 21, (3, 3, C2, C2), dtype=np.int64).astype(np.int8))
    b1 = jnp.asarray(rng.integers(-1000, 1000, (C2,), dtype=np.int64).astype(np.int32))
    b2 = jnp.asarray(rng.integers(-1000, 1000, (C2,), dtype=np.int64).astype(np.int32))
    m1 = jnp.asarray(np.full((C2,), 0.002, np.float32))
    m2 = jnp.asarray(np.full((C2,), 0.002, np.float32))
    x = jnp.asarray(rng.integers(-127, 128, (STEPS, B, H, W, C1), dtype=np.int64).astype(np.int8))

    for circ in (False, True):
        ref = np.asarray(xla_block2(x[0][:2], w1, b1, m1, w2, b2, m2, circ))
        got = np.asarray(fused_block2(x[0][:2], w1, b1, m1, w2, b2, m2, circ))
        ok = np.array_equal(ref, got)
        print(f"circular={circ}: exact={ok}"
              + ("" if ok else f" maxdiff={np.max(np.abs(ref.astype(np.int32)-got.astype(np.int32)))}"
                 f" nbad={np.sum(ref!=got)}"),
              flush=True)

    fl = 2 * 9 * (C1 * C2 + C2 * C2) * B * H * W * STEPS
    ov = scan_measure(lambda xx, *a: jnp.full((4, 4), xx[0, 0, 0, 0], jnp.int8), x)
    t = scan_measure(lambda xx, *a: fused_block2(xx, *a), x, w1, b1, m1, w2, b2, m2) - ov
    print(f"pallas fused block2: {t*1e3/STEPS:7.3f} ms/step(B={B})  {fl/t/1e12:6.1f} TOPS", flush=True)
    t1 = scan_measure(lambda xx, *a: fused_block2(xx, *a, skip2=True), x, w1, b1, m1, w2, b2, m2) - ov
    print(f"  stage1 only (conv2_1): {t1*1e3/STEPS:7.3f} ms/step", flush=True)
    t2 = scan_measure(lambda xx, *a: fused_block2(xx, *a, skip1=True), x, w1, b1, m1, w2, b2, m2) - ov
    print(f"  stage2 only (conv2_2+pool): {t2*1e3/STEPS:7.3f} ms/step", flush=True)
    t = scan_measure(lambda xx, *a: xla_block2(xx, *a), x, w1, b1, m1, w2, b2, m2) - ov
    print(f"xla block2:          {t*1e3/STEPS:7.3f} ms/step(B={B})  {fl/t/1e12:6.1f} TOPS", flush=True)


if __name__ == "__main__":
    main()
