#!/usr/bin/env python
"""Int8 conv kernel v2: whole image per grid step via auto-pipelined
BlockSpecs (no manual DMA), slab loop in VMEM. Variants:
  C=128 (conv2_2 geometry), C=64 in/out (conv1_2 geometry).
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


def _kernel(x_ref, w_ref, m_ref, out_ref, *, rows, width, cin, cout, n_slabs):
    for s in range(n_slabs):
        cols = []
        for dy in range(3):
            for dx in range(3):
                sl = x_ref[0, s * rows + dy : s * rows + dy + rows, dx : dx + width, :]
                cols.append(sl.reshape(rows * width, cin))
        p = jnp.concatenate(cols, axis=1)
        acc = jnp.dot(p, w_ref[:], preferred_element_type=jnp.int32)
        y = jnp.round(acc.astype(jnp.float32) * m_ref[:].astype(jnp.float32))
        y = jnp.clip(y, 0.0, 127.0)
        out_ref[0, s * rows : (s + 1) * rows] = y.reshape(rows, width, cout).astype(jnp.int8)


@functools.partial(jax.jit, static_argnames=("rows",))
def conv3x3_int8_v2(x, wmat, m, rows=8):
    b, h, w, c = x.shape
    n = wmat.shape[-1]
    wp8 = -(-(w + 2) // 32) * 32
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    xp = jnp.pad(xp, ((0, 0), (0, 0), (0, wp8 - (w + 2)), (0, 0)))
    kern = functools.partial(
        _kernel, rows=rows, width=w, cin=c, cout=n, n_slabs=h // rows
    )
    return pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h + 2, wp8, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, h, w, n), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, w, n), jnp.int8),
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


def run_case(name, B, H, W, C, N, STEPS=2):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(-127, 128, (STEPS, B, H, W, C), dtype=np.int64).astype(np.int8))
    k = jnp.asarray(rng.integers(-20, 21, (3, 3, C, N), dtype=np.int64).astype(np.int8))
    m = jnp.full((1, N), 0.001, jnp.float32)
    wmat = k.reshape(9 * C, N)
    fl = 2 * 9 * C * N * B * H * W * STEPS

    ref = np.asarray(xla_conv_int8(x[0][:2], k, m))
    got = np.asarray(conv3x3_int8_v2(x[0][:2], wmat, m))
    ok = np.array_equal(ref, got)
    ov = scan_measure(lambda xx, *a: jnp.full((4, 4), xx[0, 0, 0, 0], jnp.int8), x)
    t = scan_measure(lambda xx, w_, m_: conv3x3_int8_v2(xx, w_, m_), x, wmat, m) - ov
    print(f"{name}: exact={ok}  {t*1e3/STEPS:7.3f} ms/step  {fl/t/1e12:6.1f} TOPS", flush=True)


def main():
    run_case("v2 C=128 (conv2_2 geom, B=32)", 32, 64, 256, 128, 128)
    try:
        run_case("v2 C=64  (conv1_2 geom, B=8)", 8, 128, 512, 64, 64)
    except Exception as e:
        print(f"C=64 case failed: {type(e).__name__}: {str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
