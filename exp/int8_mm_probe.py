#!/usr/bin/env python
"""Probe: what int8 matmul rate does Mosaic achieve, and where the conv
kernel loses it. Variants:
  mm    — pure s8 matmul [M,K]x[K,N] in a pallas kernel, VMEM-resident
  conv  — the patch conv kernel from int8_conv_pallas (rows sweep)
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


def mm_kernel(a_ref, b_ref, o_ref, *, reps):
    acc = jnp.zeros(o_ref.shape, jnp.int32)
    for i in range(reps):
        # rotate a's role trivially to stop CSE; same FLOPs each rep
        acc += jnp.dot(a_ref[:], b_ref[:], preferred_element_type=jnp.int32)
    o_ref[:] = acc


@functools.partial(jax.jit, static_argnames=("reps",))
def mm(a, b, reps):
    return pl.pallas_call(
        functools.partial(mm_kernel, reps=reps),
        out_shape=jax.ShapeDtypeStruct((a.shape[0], b.shape[1]), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(a, b)


def measure(fn, *args, reps=3):
    np.asarray(fn(*args))
    best = float("inf")
    for _ in range(reps):
        t = time.perf_counter()
        np.asarray(fn(*args))
        best = min(best, time.perf_counter() - t)
    return best


def mmf_kernel(a_ref, b_ref, o_ref, *, reps):
    acc = jnp.zeros(o_ref.shape, jnp.float32)
    for i in range(reps):
        acc += jnp.dot(a_ref[:], b_ref[:], preferred_element_type=jnp.float32)
    o_ref[:] = acc


@functools.partial(jax.jit, static_argnames=("reps",))
def mmf(a, b, reps):
    return pl.pallas_call(
        functools.partial(mmf_kernel, reps=reps),
        out_shape=jax.ShapeDtypeStruct((a.shape[0], b.shape[1]), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(a, b)


def rate(fn, a, b, r_lo, r_hi):
    """Diff two rep counts to cancel the ~25-50 ms tunnel dispatch+fetch."""
    t_lo = measure(fn, a, b, r_lo)
    t_hi = measure(fn, a, b, r_hi)
    M, K = a.shape
    N = b.shape[1]
    fl = 2 * M * K * N * (r_hi - r_lo)
    return fl / max(t_hi - t_lo, 1e-9) / 1e12


def main():
    rng = np.random.default_rng(0)
    M, K, N = 2048, 1152, 128
    a = jnp.asarray(rng.integers(-127, 128, (M, K), dtype=np.int64).astype(np.int8))
    b = jnp.asarray(rng.integers(-127, 128, (K, N), dtype=np.int64).astype(np.int8))
    print(f"s8 mm [{M}x{K}x{N}]: {rate(mm, a, b, 256, 2048):.1f} TOPS", flush=True)

    N2 = 512
    b2 = jnp.asarray(rng.integers(-127, 128, (K, N2), dtype=np.int64).astype(np.int8))
    print(f"s8 mm [{M}x{K}x{N2}]: {rate(mm, a, b2, 64, 512):.1f} TOPS", flush=True)

    ab = a.astype(jnp.bfloat16)
    bb = b.astype(jnp.bfloat16)
    print(f"bf16 mm [{M}x{K}x{N}]: {rate(mmf, ab, bb, 128, 1024):.1f} TFLOPS", flush=True)


if __name__ == "__main__":
    main()
