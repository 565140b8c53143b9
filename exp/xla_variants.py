#!/usr/bin/env python
"""XLA-level variants for the profiled int8-path bottlenecks.

A: conv1_1 (3->64, 128x512) as int8 / bf16 / f32.
B: the conv1_2 -> pool1 -> conv2_1 chain, reduce_window vs reshape-max pool.
C: conv2_1 isolated (64->128).
"""

import functools
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")


def measure(fn, xscan, *args, reps=3):
    @jax.jit
    def scanner(xscan, *a):
        def body(c, x):
            y = fn(x, *a)
            return c, jnp.sum(y.astype(jnp.float32) ** 2)
        _, o = jax.lax.scan(body, 0, xscan)
        return o

    np.asarray(scanner(xscan, *args))
    best = float("inf")
    for _ in range(reps):
        t = time.perf_counter()
        np.asarray(scanner(xscan, *args))
        best = min(best, time.perf_counter() - t)
    return best


def conv(x, k, dtype, strides=(1, 1), pad=((1, 1), (1, 1))):
    return jax.lax.conv_general_dilated(
        x, k, strides, pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=dtype,
    )


def main():
    STEPS, B = 4, 128
    rng = np.random.default_rng(0)

    ov = None

    def bench(name, fn, xscan, *args, flops):
        nonlocal ov
        if ov is None:
            ov = measure(lambda x: jnp.full((4, 4), x.reshape(-1)[0], jnp.float32),
                         xscan)
        t = measure(fn, xscan, *args) - ov
        print(f"{name:55s} {t*1e3/STEPS:8.3f} ms/step  {flops*STEPS/t/1e12:7.1f} T/s",
              flush=True)
        return t

    # ---- A: conv1_1 dtype variants ----
    H, W = 128, 512
    x8 = jnp.asarray(rng.integers(-127, 128, (STEPS, B, H, W, 3), dtype=np.int64).astype(np.int8))
    k8 = jnp.asarray(rng.integers(-20, 21, (3, 3, 3, 64), dtype=np.int64).astype(np.int8))
    xb = x8.astype(jnp.bfloat16)
    kb = k8.astype(jnp.bfloat16)
    fl = 2 * 9 * 3 * 64 * B * H * W
    m64 = jnp.full((1, 64), 0.01, jnp.float32)

    def c11_int8(x, k, m):
        a = conv(x, k, jnp.int32)
        return jnp.clip(jnp.round(a.astype(jnp.float32) * m), 0, 127).astype(jnp.int8)

    def c11_bf16(x, k, m):
        a = conv(x, k, jnp.float32)
        return jnp.clip(jnp.round(a * m), 0, 127).astype(jnp.int8)

    bench("A conv1_1 int8 (in s8)", c11_int8, x8, k8, m64, flops=fl)
    bench("A conv1_1 bf16 (in bf16)", c11_bf16, xb, kb, m64, flops=fl)
    bench("A conv1_1 f32", c11_bf16, xb.astype(jnp.float32), kb.astype(jnp.float32), m64, flops=fl)

    # ---- C: conv2_1 isolated ----
    H2, W2 = 64, 256
    p8 = jnp.asarray(rng.integers(-127, 128, (STEPS, B, H2, W2, 64), dtype=np.int64).astype(np.int8))
    k21 = jnp.asarray(rng.integers(-20, 21, (3, 3, 64, 128), dtype=np.int64).astype(np.int8))
    m128 = jnp.full((1, 128), 0.01, jnp.float32)
    fl21 = 2 * 9 * 64 * 128 * B * H2 * W2

    def c21(x, k, m):
        a = conv(x, k, jnp.int32)
        return jnp.clip(jnp.round(a.astype(jnp.float32) * m), 0, 127).astype(jnp.int8)

    bench("C conv2_1 int8 isolated", c21, p8, k21, m128, flops=fl21)

    # ---- B: conv1_2 -> pool -> conv2_1 chain, two pool forms ----
    y8 = jnp.asarray(rng.integers(-127, 128, (STEPS, B, H, W, 64), dtype=np.int64).astype(np.int8))
    k12 = jnp.asarray(rng.integers(-20, 21, (3, 3, 64, 64), dtype=np.int64).astype(np.int8))
    fl_chain = (2 * 9 * 64 * 64 * B * H * W) + fl21

    def chain_rw(x, k12_, k21_, m64_, m128_):
        a = conv(x, k12_, jnp.int32)
        h = jnp.clip(jnp.round(a.astype(jnp.float32) * m64_), 0, 127).astype(jnp.int8)
        h = jax.lax.reduce_window(h, jnp.int8(-127), jax.lax.max,
                                  (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
        a = conv(h, k21_, jnp.int32)
        return jnp.clip(jnp.round(a.astype(jnp.float32) * m128_), 0, 127).astype(jnp.int8)

    def chain_rs(x, k12_, k21_, m64_, m128_):
        a = conv(x, k12_, jnp.int32)
        h = jnp.clip(jnp.round(a.astype(jnp.float32) * m64_), 0, 127).astype(jnp.int8)
        b, hh, ww, c = h.shape
        h = h.reshape(b, hh // 2, 2, ww // 2, 2, c).max(axis=(2, 4))
        a = conv(h, k21_, jnp.int32)
        return jnp.clip(jnp.round(a.astype(jnp.float32) * m128_), 0, 127).astype(jnp.int8)

    bench("B chain reduce_window pool", chain_rw, y8, k12, k21, m64, m128, flops=fl_chain)
    bench("B chain reshape-max pool", chain_rs, y8, k12, k21, m64, m128, flops=fl_chain)


if __name__ == "__main__":
    main()
