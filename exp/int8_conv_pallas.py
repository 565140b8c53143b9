#!/usr/bin/env python
"""Experiment: int8 3x3 conv as a Pallas patch-matmul kernel (NHWC layout).

Measures achievable int8 TOPS vs XLA's int8 conv at VGG block-2 shapes
(C_in=C_out=128, H=64, W=256, batch 128) where the profiled XLA rate is
111-286 TOPS against a 394 TOPS v5e peak.

Timing per NOTES.md: lax.scan over varying inputs, sum(y**2) reduction,
np.asarray fetch, empty-dispatch overhead subtracted.
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


def _kernel(x_hbm, w_ref, m_ref, out_ref, x_vmem, sem, *, rows, width, wp8,
            cin, cout):
    b = pl.program_id(0)
    h = pl.program_id(1)
    dma = pltpu.make_async_copy(x_hbm.at[b, pl.ds(h * rows, rows + 2)], x_vmem, sem)
    dma.start()
    dma.wait()
    cols = []
    for dy in range(3):
        for dx in range(3):
            sl = x_vmem[dy : dy + rows, dx : dx + width, :]
            cols.append(sl.reshape(rows * width, cin))
    p = jnp.concatenate(cols, axis=1)  # [rows*W, 9C] int8
    acc = jnp.dot(p, w_ref[:], preferred_element_type=jnp.int32)
    y = jnp.round(acc.astype(jnp.float32) * m_ref[:].astype(jnp.float32))
    y = jnp.clip(y, 0.0, 127.0)  # relu folded
    out_ref[0] = y.reshape(rows, width, cout).astype(jnp.int8)


@functools.partial(jax.jit, static_argnames=("rows",))
def conv3x3_int8(x, wmat, m, rows=8):
    """x: [B, H, W, C] int8; wmat: [9C, N] int8; m: [1, N] f32 requant.
    Zero-pad H and W by 1. Returns [B, H, W, N] int8 (relu+requant fused)."""
    b, h, w, c = x.shape
    n = wmat.shape[-1]
    wp8 = -(-(w + 2) // 32) * 32
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    xp = jnp.pad(xp, ((0, 0), (0, 0), (0, wp8 - (w + 2)), (0, 0)))
    kern = functools.partial(
        _kernel, rows=rows, width=w, wp8=wp8, cin=c, cout=n
    )
    return pl.pallas_call(
        kern,
        grid=(b, h // rows),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, rows, w, n), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, w, n), jnp.int8),
        scratch_shapes=[
            pltpu.VMEM((rows + 2, wp8, c), jnp.int8),
            pltpu.SemaphoreType.DMA(()),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 9 * c * n * b * h * w,
            bytes_accessed=xp.size + b * h * w * n,
            transcendentals=0,
        ),
    )(xp, wmat, m)


def xla_conv_int8(x, k, m):
    acc = jax.lax.conv_general_dilated(
        x, k, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    y = jnp.round(acc.astype(jnp.float32) * m)
    return jnp.clip(y, 0.0, 127.0).astype(jnp.int8)


def measure(fn, steps, *xs):
    @jax.jit
    def scanner(xscan, *args):
        def body(c, x):
            y = fn(x, *args)
            return c, jnp.sum(y.astype(jnp.int32) ** 2)
        _, o = jax.lax.scan(body, 0, xscan)
        return o

    np.asarray(scanner(*xs))
    best = float("inf")
    for _ in range(3):
        t = time.perf_counter()
        np.asarray(scanner(*xs))
        best = min(best, time.perf_counter() - t)
    return best


@jax.jit
def empty(x):
    return x[0, 0, 0, 0, 0] * 2


def main():
    B, H, W, C, N = 128, 64, 256, 128, 128
    STEPS = 4
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(-127, 128, (STEPS, B, H, W, C), dtype=np.int64).astype(np.int8))
    k = jnp.asarray(rng.integers(-20, 21, (3, 3, C, N), dtype=np.int64).astype(np.int8))
    m = jnp.asarray(np.full((1, N), 0.001, np.float32))
    wmat = k.reshape(9 * C, N)

    flops = 2 * 9 * C * N * B * H * W * STEPS

    # correctness first (single small batch)
    xs = x[0][:4]
    ref = np.asarray(xla_conv_int8(xs, k, m))
    got = np.asarray(conv3x3_int8(xs, wmat, m))
    match = np.array_equal(ref, got)
    print(f"exact match vs XLA int8 conv: {match}"
          f" (max |diff| {np.max(np.abs(ref.astype(np.int32) - got.astype(np.int32)))})")

    ov_scan = measure(lambda xx: jnp.full((4, 4), xx[0, 0, 0, 0], jnp.int8), STEPS, x)
    t_pal = measure(lambda xx, w_, m_: conv3x3_int8(xx, w_, m_), STEPS, x, wmat, m) - ov_scan
    t_xla = measure(lambda xx, k_, m_: xla_conv_int8(xx, k_, m_), STEPS, x, k, m) - ov_scan
    print(f"pallas: {t_pal*1e3:.3f} ms  {flops/t_pal/1e12:.1f} TOPS")
    print(f"xla:    {t_xla*1e3:.3f} ms  {flops/t_xla/1e12:.1f} TOPS")


if __name__ == "__main__":
    main()
