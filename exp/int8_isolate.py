#!/usr/bin/env python
"""Decompose the Pallas int8 conv kernel's 93 TOPS: same grid/harness as the
conv kernel but with stages removed, plus an XLA s8 GEMM reference.

  full     — DMA + patch build + dot + requant (the real kernel)
  nopatch  — DMA + dot on a resident garbage patch + requant
  nodma    — patch build from resident scratch + dot + requant
  xla_mm   — XLA-level s8[M,K] x s8[K,N] with requant epilogue
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

B, H, W, C, N = 32, 64, 256, 128, 128
ROWS = 8
WP8 = -(-(W + 2) // 32) * 32
STEPS = 2
FL = 2 * 9 * C * N * B * H * W * STEPS


def _kernel(x_hbm, w_ref, m_ref, out_ref, x_vmem, p_vmem, sem, *, mode):
    b = pl.program_id(0)
    h = pl.program_id(1)
    if mode != "nodma":
        dma = pltpu.make_async_copy(x_hbm.at[b, pl.ds(h * ROWS, ROWS + 2)], x_vmem, sem)
        dma.start()
        dma.wait()
    if mode == "nopatch":
        p = p_vmem[:]
    else:
        cols = []
        for dy in range(3):
            for dx in range(3):
                sl = x_vmem[dy : dy + ROWS, dx : dx + W, :]
                cols.append(sl.reshape(ROWS * W, C))
        p = jnp.concatenate(cols, axis=1)
    acc = jnp.dot(p, w_ref[:], preferred_element_type=jnp.int32)
    y = jnp.round(acc.astype(jnp.float32) * m_ref[:].astype(jnp.float32))
    y = jnp.clip(y, 0.0, 127.0)
    out_ref[0] = y.reshape(ROWS, W, N).astype(jnp.int8)


@functools.partial(jax.jit, static_argnames=("mode",))
def conv_like(xp, wmat, m, mode):
    kern = functools.partial(_kernel, mode=mode)
    return pl.pallas_call(
        kern,
        grid=(B, H // ROWS),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, ROWS, W, N), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, W, N), jnp.int8),
        scratch_shapes=[
            pltpu.VMEM((ROWS + 2, WP8, C), jnp.int8),
            pltpu.VMEM((ROWS * W, 9 * C), jnp.int8),
            pltpu.SemaphoreType.DMA(()),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 9 * C * N * B * H * W,
            bytes_accessed=xp.size + B * H * W * N,
            transcendentals=0,
        ),
    )(xp, wmat, m)


def xla_mm(x2d, wmat, m):
    acc = jax.lax.dot_general(
        x2d, wmat, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    return jnp.clip(jnp.round(acc.astype(jnp.float32) * m), 0, 127).astype(jnp.int8)


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
    x = jnp.asarray(rng.integers(-127, 128, (STEPS, B, H + 2, WP8, C), dtype=np.int64).astype(np.int8))
    wmat = jnp.asarray(rng.integers(-20, 21, (9 * C, N), dtype=np.int64).astype(np.int8))
    m = jnp.full((1, N), 0.001, jnp.float32)

    ov = scan_measure(lambda xx, *a: jnp.full((4, 4), xx[0, 0, 0, 0], jnp.int8), x)
    for mode in ("full", "nopatch", "nodma"):
        t = scan_measure(lambda xx, w_, m_: conv_like(xx, w_, m_, mode), x, wmat, m) - ov
        print(f"pallas {mode:8s}: {t*1e3/STEPS:7.3f} ms/step  {FL/t/1e12:6.1f} TOPS", flush=True)

    # XLA GEMM, same total FLOPs: M = B*H*W/step chunk to keep mem sane
    M2 = 65536
    x2 = jnp.asarray(rng.integers(-127, 128, (STEPS, M2, 9 * C), dtype=np.int64).astype(np.int8))
    fl2 = 2 * M2 * 9 * C * N * STEPS
    t = scan_measure(lambda xx, w_, m_: xla_mm(xx, w_, m_), x2, wmat, m) - ov
    print(f"xla s8 gemm [{M2}x{9*C}x{N}]: {t*1e3/STEPS:7.3f} ms/step  {fl2/t/1e12:6.1f} TOPS", flush=True)


if __name__ == "__main__":
    main()
