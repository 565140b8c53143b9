#!/usr/bin/env python
"""Round 5: horizontal_shift (the panorama half of synced rotation,
ops/rotation.py) is the same scalarized-gather class the overhead rotation
was — per-sample take_along_axis at [16, 224, 1232, 3]. Candidates, all
bit-exact (same source columns):

  v0  current: take_along_axis with [B, W] column indices
  v1  flat global gather (the rotate_nearest trick)
  v2  width-doubled concat + vmapped dynamic_slice (rolls as slices — TPU
      dynamic_slice is layout-native; 2x HBM for the concat)

Run: PYTHONPATH=$PYTHONPATH:/root/repo python exp/r5_shift.py
"""

# MEASURED (2026-08-21, TPU v5e, [16,224,1232,3]): v0 0.08 ms/step ==
# v1 == v2 — horizontal_shift is NOT in the slow-gather class; no change
# adopted.

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

B, H, W = 16, 224, 1232
SCAN = 4
REPS = 5


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    from witw_tpu.ops.rotation import horizontal_shift

    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.uniform(
        0, 255, (SCAN, B, H, W, 3)).astype(np.float32))
    degs = jnp.asarray(rng.uniform(0, 360, (SCAN, B)).astype(np.float32))
    np.asarray(imgs[0, 0, 0, 0])

    def v0(img, degrees):
        return horizontal_shift(img, degrees)

    def _cols(degrees):
        shift = -jnp.round(degrees * W / 360.0).astype(jnp.int32)
        return (jnp.arange(W)[None, :] - shift[:, None]) % W  # [B, W]

    def v1(img, degrees):
        cols = _cols(degrees)  # [B, W]
        flat = img.transpose(0, 2, 1, 3).reshape(B * W, H * 3)
        gidx = (cols + (jnp.arange(B) * W)[:, None]).reshape(-1)
        out = flat[gidx]
        return out.reshape(B, W, H, 3).transpose(0, 2, 1, 3)

    def v2(img, degrees):
        shift = -jnp.round(degrees * W / 360.0).astype(jnp.int32)
        start = (-shift) % W  # roll by s == slice starting at -s of [x;x]
        two = jnp.concatenate([img, img], axis=2)  # [B, H, 2W, C]

        def one(x2, s):
            return jax.lax.dynamic_slice(
                x2, (jnp.int32(0), s, jnp.int32(0)), (H, W, 3))

        return jax.vmap(one)(two, start)

    @jax.jit
    def empty(x):
        return jnp.sum(x[:, :1, :1, :1, 0] ** 2)

    ref = None
    for name, fn in (("v0", v0), ("v1", v1), ("v2", v2)):
        def scan_fn(imgs, degs, _f=fn):
            def body(c, xs):
                im, dg = xs
                y = _f(im, dg)
                return c, jnp.sum(y * y)
            _, outs = jax.lax.scan(body, 0.0, (imgs, degs))
            return outs

        jfn = jax.jit(scan_fn)
        out = np.asarray(jfn(imgs, degs))
        if ref is None:
            ref = out
        agree = np.allclose(out, ref, rtol=1e-6)
        np.asarray(empty(imgs))
        t0 = time.perf_counter()
        np.asarray(empty(imgs))
        t_empty = time.perf_counter() - t0
        times = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            np.asarray(jfn(imgs, degs))
            times.append(time.perf_counter() - t0)
        best = (min(times) - t_empty) / SCAN
        print(f"{name}: {best * 1e3:7.2f} ms/step  "
              f"({'values agree' if agree else 'MISMATCH'})", flush=True)


if __name__ == "__main__":
    main()
