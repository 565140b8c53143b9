#!/usr/bin/env python
"""Fused block-2 int8 kernel, v2: zero lane-half slicing.

Profiling v1 showed the 64-lane patch extracts dominate (90 TOPS vs the 378
a VMEM-resident patch+matmul reaches). v2 keeps every slice full-lane:

- conv2_1 consumes whole input pairs (128 lanes = two w-parity columns) and
  eats the waste as dead-K: patch K = 3dy * 2pairs * 128 = 768 with 192
  zero-weight rows (+33% MXU on conv2_1 = +11% of the fused kernel, bought
  back many times over by fast patch builds).
- conv2_1's output is written to SEPARATE even/odd VMEM scratches (128 lanes
  each), so conv2_2's 9 taps are all full-lane slices, K = 1152 with no waste.
- both parities share one matmul per stage (patches concatenated along M).
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
            ye_ref, yo_ref, *, circular, r1, r2):
    # ---- stage 1: conv2_1 -> even/odd scratches ----
    # even cols (orig 2q-4, q in [1,137)): input pairs (q-1, q) per dy
    # odd cols  (orig 2q-3):               input pairs (q, q+1) per dy
    for j0 in range(0, NROWS, r1):
        rj = min(r1, NROWS - j0)
        parts = []
        for qa0 in (0, 1):  # even uses pairs (q-1, q) -> base 0; odd (q, q+1) -> base 1
            cols = []
            for dy in range(3):
                for qa in (qa0, qa0 + 1):
                    sl = p_ref[0, j0 + dy : j0 + dy + rj, qa : qa + QN, :]
                    cols.append(sl.reshape(rj * QN, 128))
            parts.append(jnp.concatenate(cols, axis=1))
        patch = jnp.concatenate(parts, axis=0)  # [2*rj*QN, 768]
        acc = jnp.dot(patch, w1_ref[:], preferred_element_type=jnp.int32)
        acc = acc + b1_ref[:]
        y = jnp.clip(jnp.round(acc.astype(jnp.float32) * m1_ref[:]), 0., 127.)
        y = y.astype(jnp.int8)
        mq = rj * QN
        ye_ref[j0 : j0 + rj, 1 : 1 + QN, :] = y[:mq].reshape(rj, QN, 128)
        yo_ref[j0 : j0 + rj, 1 : 1 + QN, :] = y[mq:].reshape(rj, QN, 128)
    # ---- halo masking ----
    for ref in (ye_ref, yo_ref):
        ref[0:1] = jnp.zeros((1, PAIRS, 128), jnp.int8)
        ref[NROWS - 1 : NROWS] = jnp.zeros((1, PAIRS, 128), jnp.int8)
    if not circular:
        yo_ref[:, 1:2] = jnp.zeros((NROWS, 1, 128), jnp.int8)      # orig col -1
        ye_ref[:, 130:131] = jnp.zeros((NROWS, 1, 128), jnp.int8)  # orig col W

    # ---- stage 2: conv2_2 + maxpool2 ----
    U = W // 2
    for k0 in range(0, H, r2):
        rk = min(r2, H - k0)
        parts = []
        for taps in (
            ((yo_ref, 1), (ye_ref, 2), (yo_ref, 2)),  # even out cols w=2u
            ((ye_ref, 2), (yo_ref, 2), (ye_ref, 3)),  # odd out cols w=2u+1
        ):
            cols = []
            for dy in range(3):
                for (ref, qa) in taps:
                    sl = ref[k0 + dy : k0 + dy + rk, qa : qa + U, :]
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


def _w1_deadk(w1):
    """[3,3,64,128] HWIO -> [768,128] with dead rows.

    Patch col order per dy: [pair_a (128), pair_b (128)] where for the even
    parity pair_a=(q-1)->(lo dead, hi=dx-1), pair_b=q->(lo=dx0, hi=dx+1); the
    odd parity has pair_a=q->(lo=dx-1... wait both parities must share ONE
    weight matrix: even cols use lanes (hi_a, lo_b, hi_b) as (dx-1,dx0,dx+1);
    odd cols use (lo_a... odd: pair_a=q: lo=dx? odd col 2q-3 taps orig
    (2q-4, 2q-3, 2q-2) = (even q: pair_a lo? -- base qa0=1 so pair_a=q:
    lo=orig 2q-4 = dx-1, hi=orig 2q-3 = dx0; pair_b=q+1: lo=orig 2q-2 =
    dx+1, hi dead.
    even: base qa0=0: pair_a=q-1: lo=orig 2q-6 DEAD, hi=orig 2q-5?? orig
    2q-5 = (2q-4)-1 = dx-1 OK; pair_b=q: lo=2q-4=dx0, hi=2q-3=dx+1.
    So even lane-use: (dead, dx-1, dx0, dx+1); odd: (dx-1, dx0, dx+1, dead).
    These DIFFER -> need separate weight matrices after all, or a shared one
    with both dead slots... shared impossible. Use two matrices and merge the
    parity matmuls by block-diagonal M? No - M-concat requires same weights.
    => build w1 = [w1_even; w1_odd] can't. Fall back: THE SAME matrix works
    if we pick odd base qa0=0? odd taps orig (2q-4..2q-2): with pair_a=q-1:
    (2q-6 dead, 2q-5 dead!) no. Keep two matmuls? -- resolved instead by
    shifting the ODD patch's pair base to capture the same relative layout:
    impossible. So: single matmul with K=1024: per dy use pairs (q-1, q,
    q+1) = 384 lanes?? even taps within: (dead,dx-1),(dx0,dx+1),(dead,dead)
    odd: (dead,dead),(dx-1,dx0),(dx+1,dead) -- still different.
    DECISION: keep two matmuls (one per parity), each with its own deadk
    matrix. M=rj*QN each.
    """
    raise NotImplementedError


def _w1_parity(w1, parity):
    """[3,3,64,128] -> [768,128] dead-K matrix for one parity.

    Per dy the patch holds two full pairs (256 lanes = 4 columns of 64):
    even parity: [lo(q-1)=dead, hi(q-1)=dx-1, lo(q)=dx0, hi(q)=dx+1]
    odd  parity: [lo(q)=dx-1,   hi(q)=dx0,    lo(q+1)=dx+1, hi(q+1)=dead]
    """
    w = jnp.asarray(w1, jnp.int8)
    z = jnp.zeros((3, 1, 64, 128), jnp.int8)
    if parity == 0:
        slots = jnp.concatenate([z, w[:, 0:1], w[:, 1:2], w[:, 2:3]], axis=1)
    else:
        slots = jnp.concatenate([w[:, 0:1], w[:, 1:2], w[:, 2:3], z], axis=1)
    return slots.reshape(768, 128)


def _kernel2(p_ref, w1e_ref, w1o_ref, b1_ref, m1_ref, w2_ref, b2_ref, m2_ref,
             out_ref, ye_ref, yo_ref, *, circular, r1, r2):
    # stage 1: one matmul per parity (different dead-K weight matrices)
    for j0 in range(0, NROWS, r1):
        rj = min(r1, NROWS - j0)
        for qa0, w_ref, y_ref in ((0, w1e_ref, ye_ref), (1, w1o_ref, yo_ref)):
            cols = []
            for dy in range(3):
                for qa in (qa0, qa0 + 1):
                    sl = p_ref[0, j0 + dy : j0 + dy + rj, qa : qa + QN, :]
                    cols.append(sl.reshape(rj * QN, 128))
            patch = jnp.concatenate(cols, axis=1)  # [rj*QN, 768]
            acc = jnp.dot(patch, w_ref[:], preferred_element_type=jnp.int32)
            acc = acc + b1_ref[:]
            y = jnp.clip(jnp.round(acc.astype(jnp.float32) * m1_ref[:]), 0., 127.)
            y_ref[j0 : j0 + rj, 1 : 1 + QN, :] = (
                y.astype(jnp.int8).reshape(rj, QN, 128)
            )
    for ref in (ye_ref, yo_ref):
        ref[0:1] = jnp.zeros((1, PAIRS, 128), jnp.int8)
        ref[NROWS - 1 : NROWS] = jnp.zeros((1, PAIRS, 128), jnp.int8)
    if not circular:
        yo_ref[:, 1:2] = jnp.zeros((NROWS, 1, 128), jnp.int8)
        ye_ref[:, 130:131] = jnp.zeros((NROWS, 1, 128), jnp.int8)

    U = W // 2
    for k0 in range(0, H, r2):
        rk = min(r2, H - k0)
        parts = []
        for taps in (
            ((yo_ref, 1), (ye_ref, 2), (yo_ref, 2)),
            ((ye_ref, 2), (yo_ref, 2), (ye_ref, 3)),
        ):
            cols = []
            for dy in range(3):
                for (ref, qa) in taps:
                    sl = ref[k0 + dy : k0 + dy + rk, qa : qa + U, :]
                    cols.append(sl.reshape(rk * U, 128))
            parts.append(jnp.concatenate(cols, axis=1))
        patch = jnp.concatenate(parts, axis=0)
        acc = jnp.dot(patch, w2_ref[:], preferred_element_type=jnp.int32)
        acc = acc + b2_ref[:]
        z = jnp.clip(jnp.round(acc.astype(jnp.float32) * m2_ref[:]), 0., 127.)
        mu = rk * U
        zw = jnp.maximum(z[:mu], z[mu:])
        zh = jnp.max(zw.reshape(rk // 2, 2, U, C2), axis=1)
        out_ref[0, k0 // 2 : (k0 + rk) // 2] = zh.astype(jnp.int8)


@functools.partial(jax.jit, static_argnames=("circular", "r1", "r2"))
def fused_block2_v2(x, w1, b1, m1, w2, b2, m2, circular=False, r1=11, r2=8):
    b = x.shape[0]
    xp = jnp.pad(x, ((0, 0), (2, 2), (0, 0), (0, 0)))
    xp = jnp.pad(xp, ((0, 0), (0, 0), (4, 2 * PAIRS - W - 4), (0, 0)),
                 mode="wrap" if circular else "constant")
    xp = xp.reshape(b, H + 4, PAIRS, 128)
    kern = functools.partial(_kernel2, circular=circular, r1=r1, r2=r2)
    return pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, H + 4, PAIRS, 128), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 7,
        out_specs=pl.BlockSpec(
            (1, H // 2, W // 2, C2), lambda i: (i, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, H // 2, W // 2, C2), jnp.int8),
        scratch_shapes=[
            pltpu.VMEM((NROWS, PAIRS, 128), jnp.int8),
            pltpu.VMEM((NROWS, PAIRS, 128), jnp.int8),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 9 * (C1 * C2 + C2 * C2) * b * H * W,
            bytes_accessed=xp.size + b * (H // 2) * (W // 2) * C2,
            transcendentals=0,
        ),
    )(xp, _w1_parity(w1, 0), _w1_parity(w1, 1), b1.reshape(1, C2),
      m1.reshape(1, C2), w2.reshape(9 * C2, C2), b2.reshape(1, C2),
      m2.reshape(1, C2))


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
        got = np.asarray(fused_block2_v2(x[0][:2], w1, b1, m1, w2, b2, m2, circ))
        ok = np.array_equal(ref, got)
        print(f"v2 circular={circ}: exact={ok}"
              + ("" if ok else f" nbad={np.sum(ref != got)}"), flush=True)

    fl = 2 * 9 * (C1 * C2 + C2 * C2) * B * H * W * STEPS
    ov = scan_measure(lambda xx, *a: jnp.full((4, 4), xx[0, 0, 0, 0], jnp.int8), x)
    t = scan_measure(lambda xx, *a: fused_block2_v2(xx, *a), x, w1, b1, m1, w2, b2, m2) - ov
    print(f"pallas fused block2 v2: {t*1e3/STEPS:7.3f} ms/step(B={B})  {fl/t/1e12:6.1f} TOPS", flush=True)


if __name__ == "__main__":
    main()
