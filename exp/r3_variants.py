#!/usr/bin/env python
"""Round-3 serving-path variant sweep (real TPU, end-to-end bench harness).

Measures pairs/s for combinations of:
- corner_major: polar gather corner layout ("k" = current, "p" = pixel-major)
- u8: feed raw uint8 inputs instead of f32 (loader emits uint8; 4x less
  HBM read in normalize + 4x smaller scan operand slices)
- im2col: conv1_1 as explicit 9-shift patches + 1x1 conv
- fcbf16: first_conv_bf16 static tables

Usage: python exp/r3_variants.py v0 v1 ...   (see VARIANTS dict)
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = 128
SCAN_STEPS = 4
REPS = 5

VARIANTS = {
    "v0": {},  # baseline (current bench.py path)
    "v1": {"corner_major": "p"},
    "v2": {"u8": True},
    "v3": {"corner_major": "p", "u8": True},
    "v4": {"im2col": True},
    "v5": {"im2col": True, "u8": True, "corner_major": "p"},
    "v6": {"fcbf16": True, "u8": True, "corner_major": "p"},
    "v7": {"fcbf16": True},
    "v8": {"split_block1": True},
    "v0b": {},  # baseline re-measure (run-to-run noise)
    "v9": {"w2d": 2},    # conv1_1 width space-to-depth f=2 (exact)
    "v10": {"w2d": 4},   # f=4: C_in=12, C_out=256, 4x FLOPs
    "v11": {"pool_slices": True},
    "v12": {"w2d": 2, "pool_slices": True},
    "v13": {"w2d2": 2},            # conv2_1 space-to-depth (C_in 64 -> 128)
    "v14": {"w2d": 4, "w2d2": 2},  # both degenerate first-of-block convs
}


def run(name, opts):
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    from witw_tpu.configs import fov_experiment
    from witw_tpu.match.correlation import circular_correlation
    from witw_tpu.match.distance import chord_distance
    from witw_tpu.models.quantize import (
        preprocess_static_int8,
        quantize_pipeline_static,
        quantized_fov_forward_static,
    )
    from witw_tpu.train.pipeline import make_pipeline

    cfg = fov_experiment(dataset="cvusa", fov=360)
    pipeline = make_pipeline(cfg)
    state = pipeline.init(jax.random.PRNGKey(0))
    np.asarray(jax.tree.leaves(state.params)[0])
    d = cfg.data

    rng = np.random.default_rng(0)
    surf_f = rng.uniform(0, 255, (SCAN_STEPS, BATCH, d.surface_height,
                                  d.surface_width_max, 3))
    over_f = rng.uniform(0, 255, (SCAN_STEPS, BATCH, d.overhead_size,
                                  d.overhead_size, 3))
    if opts.get("u8"):
        surf = jnp.asarray(surf_f.astype(np.uint8))
        over = jnp.asarray(over_f.astype(np.uint8))
    else:
        surf = jnp.asarray(surf_f.astype(np.float32))
        over = jnp.asarray(over_f.astype(np.float32))

    s_in, p_in = pipeline._preprocess(
        {"surface": jnp.asarray(surf_f[0][:8], jnp.float32),
         "overhead": jnp.asarray(over_f[0][:8], jnp.float32)},
        jax.random.PRNGKey(0), train=False,
    )
    sq_s, sq_o = quantize_pipeline_static(
        state, [(s_in, p_in)],
        first_conv_bf16=opts.get("fcbf16", False),
    )
    corner_major = opts.get("corner_major", "k")
    im2col = opts.get("im2col", False)
    split1 = opts.get("split_block1", False)
    w2d = opts.get("w2d", 0)
    w2d2 = opts.get("w2d2", 0)
    pslices = opts.get("pool_slices", False)

    def embed_match(batch):
        surface_q, polar_q = preprocess_static_int8(
            cfg.data, sq_s, sq_o, batch, jax.random.PRNGKey(0),
            corner_major=corner_major,
        )
        s_emb = quantized_fov_forward_static(
            sq_s, surface_q, False, x_quantized=True, first_conv_im2col=im2col,
            split_block1=split1, first_conv_w2d=w2d, pool_slices=pslices,
            block2_w2d=w2d2)
        o_emb = quantized_fov_forward_static(
            sq_o, polar_q, True, x_quantized=True, first_conv_im2col=im2col,
            split_block1=split1, first_conv_w2d=w2d, pool_slices=pslices,
            block2_w2d=w2d2)
        corr = circular_correlation(o_emb, s_emb)
        distance, _ = chord_distance(o_emb, s_emb, corr)
        return distance

    @jax.jit
    def scan_steps(surf, over):
        def body(carry, xs):
            s, o = xs
            return carry, embed_match({"surface": s, "overhead": o}).sum()
        _, outs = jax.lax.scan(body, 0, (surf, over))
        return outs

    @jax.jit
    def empty_dispatch(surf):
        return (surf[0, 0, 0, 0, 0].astype(jnp.float32)) * 2.0

    def measure(fn, *args):
        np.asarray(fn(*args))
        best = float("inf")
        for _ in range(REPS):
            start = time.perf_counter()
            np.asarray(fn(*args))
            best = min(best, time.perf_counter() - start)
        return best

    overhead_t = measure(empty_dispatch, surf)
    total = measure(scan_steps, surf, over)
    device_time = max(total - overhead_t, 1e-6)
    pairs = BATCH * SCAN_STEPS / device_time
    print(json.dumps({"variant": name, "opts": opts,
                      "pairs_per_sec": round(pairs, 1),
                      "ms_per_step": round(device_time / SCAN_STEPS * 1e3, 2)}),
          flush=True)
    return pairs


if __name__ == "__main__":
    names = sys.argv[1:] or list(VARIANTS)
    for nm in names:
        run(nm, VARIANTS[nm])
