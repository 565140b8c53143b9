#!/usr/bin/env python
"""Mosaic capability probes for the fused int8 block kernels:
T1: 64-offset lane slicing of int8 values   x[:, 0:64], x[:, 64:128]
T2: lane concat of two [., 64] int8 -> [., 128]
T3: s8 dot with N=64 output lanes
T4: 3D slab slice with lane-half select + reshape (the patch-build op)
"""

import functools
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")


def probe(name, fn, *args, want=None):
    try:
        got = np.asarray(fn(*args))
        ok = True if want is None else np.array_equal(got, want)
        print(f"{name}: COMPILES, correct={ok}", flush=True)
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__}: {str(e)[:160]}", flush=True)


def main():
    rng = np.random.default_rng(0)
    x = rng.integers(-127, 128, (256, 128), dtype=np.int64).astype(np.int8)
    xj = jnp.asarray(x)

    # T1: lane-half slice + add
    def k1(x_ref, o_ref):
        lo = x_ref[:, 0:64]
        hi = x_ref[:, 64:128]
        o_ref[:] = (lo.astype(jnp.int32) + hi.astype(jnp.int32)).astype(jnp.int32)

    @jax.jit
    def t1(x):
        return pl.pallas_call(
            k1,
            out_shape=jax.ShapeDtypeStruct((256, 64), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)

    want1 = x[:, :64].astype(np.int32) + x[:, 64:].astype(np.int32)
    probe("T1 lane-half slice s8", t1, xj, want=want1)

    # T2: lane concat [.,64]+[.,64] -> [.,128]
    def k2(x_ref, o_ref):
        lo = x_ref[:, 0:64]
        hi = x_ref[:, 64:128]
        o_ref[:] = jnp.concatenate([hi, lo], axis=1)

    @jax.jit
    def t2(x):
        return pl.pallas_call(
            k2,
            out_shape=jax.ShapeDtypeStruct((256, 128), jnp.int8),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)

    want2 = np.concatenate([x[:, 64:], x[:, :64]], axis=1)
    probe("T2 lane concat of halves", t2, xj, want=want2)

    # T3: s8 dot with N=64
    w = rng.integers(-20, 21, (128, 64), dtype=np.int64).astype(np.int8)
    wj = jnp.asarray(w)

    def k3(x_ref, w_ref, o_ref):
        o_ref[:] = jnp.dot(x_ref[:], w_ref[:], preferred_element_type=jnp.int32)

    @jax.jit
    def t3(x, w):
        return pl.pallas_call(
            k3,
            out_shape=jax.ShapeDtypeStruct((256, 64), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x, w)

    want3 = x.astype(np.int32) @ w.astype(np.int32)
    probe("T3 s8 dot N=64", t3, xj, wj, want=want3)

    # T4: h-parity patch build: slab [R, W, 128] (lanes = c + 64*(h odd)),
    # extract [R, W, 64] per parity via lane half, sublane-ish ops + reshape
    R, W = 8, 64
    slab = rng.integers(-127, 128, (R, W, 128), dtype=np.int64).astype(np.int8)
    slabj = jnp.asarray(slab)

    def k4(x_ref, o_ref):
        even = x_ref[:, :, 0:64]   # [R, W, 64]
        odd = x_ref[:, :, 64:128]
        p = jnp.concatenate(
            [even.reshape(R * W, 64), odd.reshape(R * W, 64)], axis=1
        )
        o_ref[:] = p

    @jax.jit
    def t4(x):
        return pl.pallas_call(
            k4,
            out_shape=jax.ShapeDtypeStruct((R * W, 128), jnp.int8),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)

    want4 = np.concatenate(
        [slab[:, :, :64].reshape(R * W, 64), slab[:, :, 64:].reshape(R * W, 64)],
        axis=1,
    )
    probe("T4 parity patch build", t4, slabj, want=want4)


if __name__ == "__main__":
    main()
