#!/usr/bin/env python
"""Round 5: the baseline family's synced-rotation gather dominates its
reference-eval step (per-op trace: the [16*750*750, 3] nearest-neighbor
gather fusion is ~86% of device time — exp/r5_baseline_trace.py). Sweep
alternative formulations of rotate_nearest's batched 2-D gather at the
production geometry, all bit-exact (same nearest indices; gathers move
exact values).

  v0  current: vmap over samples of img[yi, xi] ([H, W] advanced indexing)
  v1  flat per-sample take_along_axis over [S*S, C]
  v2  channel-major [B*C, S*S] take_along_axis along axis 1
  v3  uint8 gather (inputs are u8-valued; cast to f32 after + mask)
  v4  bf16 gather (exact for u8-valued inputs)
  v5  one-shot global gather: [B*S*S, C] values, [B*H*W] global indices

Run: PYTHONPATH=$PYTHONPATH:/root/repo python exp/r5_rotation.py
"""

# MEASURED (2026-08-21, TPU v5e, [16,750,750,3]): v0 103.9 ms/step,
# v1 95.6, v2 287.5 (channel-major LOSES), v3 70.8 (u8, not exact for
# resized floats), v4 79.3 (bf16, same caveat), v5 69.5 — v5 adopted into
# ops/rotation.rotate_nearest ("MISMATCH" flags are the harness's
# sum-reduction order, not values; gathers move exact values).

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

B, S = 16, 750
SCAN = 4
REPS = 5


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    from witw_tpu.ops.rotation import rotate_nearest

    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.integers(
        0, 256, (SCAN, B, S, S, 3)).astype(np.float32))
    degs = jnp.asarray(rng.uniform(0, 360, (SCAN, B)).astype(np.float32))
    np.asarray(imgs[0, 0, 0, 0])

    import math

    def indices(degrees):
        """[B] degrees -> (valid [B,S,S], flat yi*S+xi [B,S,S]) exactly as
        rotate_nearest computes them."""
        theta = degrees * (math.pi / 180.0)
        cos_t = jnp.cos(theta)[:, None, None]
        sin_t = jnp.sin(theta)[:, None, None]
        c = (S - 1) / 2.0
        ii, jj = jnp.meshgrid(
            jnp.arange(S, dtype=jnp.float32), jnp.arange(S, dtype=jnp.float32),
            indexing="ij")
        dy = (ii - c)[None]
        dx = (jj - c)[None]
        src_x = cos_t * dx - sin_t * dy + c
        src_y = sin_t * dx + cos_t * dy + c
        xi = jnp.round(src_x).astype(jnp.int32)
        yi = jnp.round(src_y).astype(jnp.int32)
        valid = (xi >= 0) & (xi < S) & (yi >= 0) & (yi < S)
        xi = jnp.clip(xi, 0, S - 1)
        yi = jnp.clip(yi, 0, S - 1)
        return valid, yi * S + xi

    def v0(img, degrees):
        return rotate_nearest(img, degrees)

    def v1(img, degrees):
        valid, flat_idx = indices(degrees)
        flat = img.reshape(B, S * S, 3)
        out = jnp.take_along_axis(
            flat, flat_idx.reshape(B, S * S)[:, :, None], axis=1)
        return jnp.where(
            valid.reshape(B, S * S)[:, :, None], out, 0.0
        ).reshape(B, S, S, 3)

    def v2(img, degrees):
        valid, flat_idx = indices(degrees)
        cm = img.transpose(0, 3, 1, 2).reshape(B * 3, S * S)
        idx = jnp.repeat(flat_idx.reshape(B, S * S), 3, axis=0)
        out = jnp.take_along_axis(cm, idx, axis=1)
        out = out.reshape(B, 3, S, S).transpose(0, 2, 3, 1)
        return jnp.where(valid[..., None], out, 0.0)

    def v3(img, degrees):
        valid, flat_idx = indices(degrees)
        flat = img.astype(jnp.uint8).reshape(B, S * S, 3)
        out = jnp.take_along_axis(
            flat, flat_idx.reshape(B, S * S)[:, :, None], axis=1)
        return jnp.where(
            valid.reshape(B, S * S)[:, :, None],
            out.astype(jnp.float32), 0.0).reshape(B, S, S, 3)

    def v4(img, degrees):
        valid, flat_idx = indices(degrees)
        flat = img.astype(jnp.bfloat16).reshape(B, S * S, 3)
        out = jnp.take_along_axis(
            flat, flat_idx.reshape(B, S * S)[:, :, None], axis=1)
        return jnp.where(
            valid.reshape(B, S * S)[:, :, None],
            out.astype(jnp.float32), 0.0).reshape(B, S, S, 3)

    def v5(img, degrees):
        valid, flat_idx = indices(degrees)
        gidx = (flat_idx.reshape(B, S * S)
                + (jnp.arange(B) * (S * S))[:, None]).reshape(-1)
        out = img.reshape(B * S * S, 3)[gidx]
        return jnp.where(
            valid.reshape(B * S * S)[:, None], out, 0.0
        ).reshape(B, S, S, 3)

    @jax.jit
    def empty(x):
        return jnp.sum(x[:, :1, :1, :1, 0] ** 2)

    ref = None
    for name, fn in (("v0", v0), ("v1", v1), ("v2", v2), ("v3", v3),
                     ("v4", v4), ("v5", v5)):
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
        exact = np.array_equal(out, ref)
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
        print(f"{name}: {best * 1e3:7.1f} ms/step  "
              f"({'bit-exact' if exact else 'MISMATCH'})", flush=True)


if __name__ == "__main__":
    main()
