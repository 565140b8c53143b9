#!/usr/bin/env python
"""Round 4: patch-free int8 3x3 conv via a dense 9-tap matmul (VERDICT r3 #3).

The one untried lever on the serving ceiling (NOTES.md round 2b(d)): feed the
MXU without materializing patches. Prior attempts concatenated patch columns
in VMEM (copy-bound, 88-125 TOPS). This kernel avoids ALL value copies of the
input:

- layout [B, H+2, C, Wp] int8 (channels on sublanes — 64 = 2 int8 sublane
  tiles; width on lanes — 512 = 4 lane tiles),
- per output row r, the 3-row input window x[r:r+3] is RESHAPE-VIEWED to
  [3C=192, Wp] (sublane-merge of a 32-aligned dim — tiling-compatible, no
  data movement),
- ONE dense matmul [3*Cout=192, 3C=192] x [192, Wp]: the weight matrix packs
  all 9 taps — out block dx, in block dy holds K[dy, dx] — so there are no
  dead FLOPs and no input shifting,
- the dx shifts move to the int32 RESULT: out = roll(tmp[0:64], +1) +
  tmp[64:128] + roll(tmp[128:192], -1) (pltpu.roll is 32-bit-only — rolling
  the accumulator is legal where rolling the int8 input was not). Roll wrap
  IS the circular tower's width semantics; the zero-pad tower would need an
  edge fix-up (not measured here — circular is the cost-representative case).

MXU fill ceiling: M=192 (1.5 passes), K=192 (1.5 passes) => 56% = 221 TOPS,
vs XLA's measured 183 on conv1_2. The open question is whether the VPU
epilogue (2 rolls + 2 adds + requant on [64, Wp] int32) pipelines behind the
matmul or serializes (predicted 94-140 TOPS if serialized).

Usage: python exp/r4_conv_taps.py
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


def _tap_kernel(x_ref, w_ref, m_ref, out_ref, *, h, width, c, n):
    # x_ref [1, H+2, C, Wp] int8; w_ref [3n, 3c] int8 (out dx-blocks, in
    # dy-blocks); m_ref [n, 1] f32 requant; out [1, H, C, Wp] int8
    def row(r, _):
        win = x_ref[0, pl.ds(r, 3), :, :].reshape(3 * c, width)
        tmp = jax.lax.dot_general(
            w_ref[:], win, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )  # [3n, Wp]
        acc = (
            pltpu.roll(tmp[0:n], 1, 1)
            + tmp[n : 2 * n]
            + pltpu.roll(tmp[2 * n : 3 * n], width - 1, 1)
        )
        y = jnp.round(acc.astype(jnp.float32) * m_ref[:])
        out_ref[0, r] = jnp.clip(y, 0.0, 127.0).astype(jnp.int8)
        return 0

    jax.lax.fori_loop(0, h, row, 0)


@jax.jit
def conv3x3_int8_taps(x, wmat, m):
    """x [B, H, C, W] int8 (cw layout, width circular); wmat [3N, 3C] packed
    taps; m [N, 1] requant scales. Returns [B, H, C, W] int8 (ReLU'd)."""
    b, h, c, w = x.shape
    n = wmat.shape[0] // 3
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0)))  # zero rows top/bottom
    kern = functools.partial(_tap_kernel, h=h, width=w, c=c, n=n)
    return pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h + 2, c, w), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, c, w), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, c, w), jnp.int8),
        cost_estimate=pl.CostEstimate(
            flops=2 * 9 * c * n * b * h * w,
            bytes_accessed=xp.size + b * h * w * n,
            transcendentals=0,
        ),
    )(xp, wmat, m)


def pack_taps(k):
    """k [3, 3, Cin, Cout] -> [3*Cout, 3*Cin]: w[dx*N+o, dy*C+i] = k[dy,dx,i,o]
    (dx blocks on the out axis, dy blocks on the in axis)."""
    _, _, c, n = k.shape
    w = np.zeros((3 * n, 3 * c), np.int8)
    for dy in range(3):
        for dx in range(3):
            w[dx * n : (dx + 1) * n, dy * c : (dy + 1) * c] = k[dy, dx].T
    return w


def xla_conv_int8_circular(x_nhwc, k, m):
    """Reference: circular width padding, zero height padding, requant+ReLU."""
    xp = jnp.concatenate(
        [x_nhwc[:, :, -1:, :], x_nhwc, x_nhwc[:, :, :1, :]], axis=2
    )
    acc = jax.lax.conv_general_dilated(
        xp, k, (1, 1), ((1, 1), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    y = jnp.round(acc.astype(jnp.float32) * m)
    return jnp.clip(y, 0.0, 127.0).astype(jnp.int8)


def scan_measure(fn, xscan, *args):
    @jax.jit
    def scanner(xscan, *a):
        def body(carry, x):
            y = fn(x, *a)
            return carry, jnp.sum(y.astype(jnp.int32) ** 2)

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
    B, H, W, C, N, STEPS = 16, 128, 512, 64, 64, 2
    rng = np.random.default_rng(0)
    x_nhwc = rng.integers(-127, 128, (STEPS, B, H, W, C),
                          dtype=np.int64).astype(np.int8)
    k = rng.integers(-20, 21, (3, 3, C, N), dtype=np.int64).astype(np.int8)
    m = np.full((1, N), 0.001, np.float32)

    x_cw = jnp.asarray(np.transpose(x_nhwc, (0, 1, 2, 4, 3)))  # [S,B,H,C,W]
    wmat = jnp.asarray(pack_taps(k))
    m_cw = jnp.asarray(m.reshape(N, 1))

    # correctness vs the XLA circular conv
    ref = np.asarray(xla_conv_int8_circular(jnp.asarray(x_nhwc[0][:2]),
                                            jnp.asarray(k), jnp.asarray(m)))
    got = np.asarray(conv3x3_int8_taps(x_cw[0][:2], wmat, m_cw))
    got_nhwc = np.transpose(got, (0, 1, 3, 2))
    ok = np.array_equal(ref, got_nhwc)
    print(f"exact vs XLA circular conv: {ok}", flush=True)
    if not ok:
        bad = np.argwhere(ref != got_nhwc)
        print(f"  {len(bad)} mismatches, first at {bad[0]}; "
              f"ref={ref[tuple(bad[0])]} got={got_nhwc[tuple(bad[0])]}")

    fl = 2 * 9 * C * N * B * H * W * STEPS
    ov = scan_measure(
        lambda xx, *a: jnp.full((4, 4), xx[0, 0, 0, 0], jnp.int8), x_cw)
    t_tap = scan_measure(conv3x3_int8_taps, x_cw, wmat, m_cw) - ov
    print(f"tap kernel : {t_tap*1e3/STEPS:7.3f} ms/step "
          f"{fl/t_tap/1e12:6.1f} TOPS", flush=True)

    x_nh = jnp.asarray(x_nhwc)
    kj, mj = jnp.asarray(k), jnp.asarray(m)
    t_xla = scan_measure(xla_conv_int8_circular, x_nh, kj, mj) - ov
    print(f"XLA conv   : {t_xla*1e3/STEPS:7.3f} ms/step "
          f"{fl/t_xla/1e12:6.1f} TOPS", flush=True)


if __name__ == "__main__":
    main()
