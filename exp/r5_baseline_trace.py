#!/usr/bin/env python
"""Round 5: per-op trace + batch sweep for the baseline-family serving step
(VERDICT r4 #8).

BASELINE.md records 133.9 f32 / 137.9 int8 pairs/s at the production eval
geometry (surface 224x1232 repeated to 448x1232 + overhead 750^2, batch 16)
with "front-conv/pool bound, same physics as conv1_1" stated as inference.
This script makes it attribution: trace the f32 and int8 steps under
jax.profiler, name each op's time/bound, and sweep batch 8/16/32 to check
whether the batch choice moves the number.

Usage: PYTHONPATH=$PYTHONPATH:/root/repo python exp/r5_baseline_trace.py
       [--batches 8 16 32] [--trace-batch 16]
"""

# MEASURED (2026-08-21, TPU v5e): eval-contract (with rotation) f32
# 133.7-144.8 / int8 137.5-147.6 pairs/s pre-fix, f32 190.9-195.5 / int8
# 200.7-216.8 after the flat-gather rotation; SERVING path (no rotation)
# f32 1856-2253 / int8 2805-3720 pairs/s (one b32 run read 6122; +-40%
# harness spread below ~20 ms steps). The f32 trace pinned the rotation
# gather at ~86% of the eval-contract step. BASELINE.md rows updated.

import argparse
import os
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from exp.profile_bench import parse_trace  # noqa: E402

SCAN_STEPS = 4
REPS = 5


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="+", default=[8, 16, 32])
    ap.add_argument("--trace-batch", type=int, default=16)
    ap.add_argument("--top", type=int, default=25)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    from witw_tpu.configs import baseline_experiment
    from witw_tpu.match.losses import pairwise_sq_distances
    from witw_tpu.models.quantize import (
        quantize_baseline_pipeline_static,
        quantized_baseline_forward_static,
    )
    from witw_tpu.train.pipeline import make_pipeline

    rng = np.random.default_rng(0)
    cfg = baseline_experiment(dataset="cvusa")
    pipe = make_pipeline(cfg)
    surf_hw, over_hw = (224, 1232), (750, 750)
    state = pipe.init(jax.random.PRNGKey(0), surface_hw=surf_hw,
                      overhead_hw=over_hw)
    np.asarray(jax.tree.leaves(state.params)[0])

    cs = rng.uniform(0, 255, (2, *surf_hw, 3)).astype(np.float32)
    co = rng.uniform(0, 255, (2, *over_hw, 3)).astype(np.float32)
    cs_p, co_p = pipe._preprocess(
        {"surface": cs, "overhead": co}, jax.random.PRNGKey(0), False)
    sq_s, sq_o = quantize_baseline_pipeline_static(
        state, [(np.asarray(cs_p), np.asarray(co_p))])

    def f32_step(s, o):
        surf, over = pipe._preprocess(
            {"surface": s, "overhead": o}, jax.random.PRNGKey(0), False)
        se = pipe.surface_model.apply(
            {"params": state.params["surface"],
             "batch_stats": state.batch_stats["surface"]}, surf, train=False)
        oe = pipe.overhead_model.apply(
            {"params": state.params["overhead"],
             "batch_stats": state.batch_stats["overhead"]}, over, train=False)
        return pairwise_sq_distances(oe, se)

    def int8_step(s, o):
        surf, over = pipe._preprocess(
            {"surface": s, "overhead": o}, jax.random.PRNGKey(0), False)
        se = quantized_baseline_forward_static(sq_s, surf)
        oe = quantized_baseline_forward_static(sq_o, over)
        return pairwise_sq_distances(oe, se)

    # The SERVING path (tools/serve.py, tools/heatmap.py) embeds raw inputs —
    # no synced rotation (that is reference train/eval augmentation,
    # cvig_baseline.py:324-328,410-414). The r4 family bench measured the
    # eval contract INCLUDING the rotation gather; serving pays only towers
    # + distance.
    def f32_serve(s, o):
        se = pipe.surface_model.apply(
            {"params": state.params["surface"],
             "batch_stats": state.batch_stats["surface"]}, s, train=False)
        oe = pipe.overhead_model.apply(
            {"params": state.params["overhead"],
             "batch_stats": state.batch_stats["overhead"]}, o, train=False)
        return pairwise_sq_distances(oe, se)

    def int8_serve(s, o):
        se = quantized_baseline_forward_static(sq_s, s)
        oe = quantized_baseline_forward_static(sq_o, o)
        return pairwise_sq_distances(oe, se)

    def make_scan(step):
        def scan_fn(surf, over):
            def body(c, xs):
                s, o = xs
                d = step(s, o)
                return c, jnp.sum(d * d)
            _, outs = jax.lax.scan(body, 0.0, (surf, over))
            return outs
        return jax.jit(scan_fn)

    def inputs(b):
        s = jnp.asarray(rng.uniform(
            0, 255, (SCAN_STEPS, b, *surf_hw, 3)).astype(np.float32))
        o = jnp.asarray(rng.uniform(
            0, 255, (SCAN_STEPS, b, *over_hw, 3)).astype(np.float32))
        np.asarray(s[0, 0, 0, 0]), np.asarray(o[0, 0, 0, 0])
        return s, o

    @jax.jit
    def empty(surf):
        return jnp.sum(surf[:, :1, :1, :1, 0] ** 2)

    results = {}
    for label, step in (("f32", f32_step), ("int8", int8_step),
                        ("f32_serve", f32_serve), ("int8_serve", int8_serve)):
        for b in args.batches:
            s, o = inputs(b)
            fn = make_scan(step)
            np.asarray(fn(s, o))  # compile
            np.asarray(empty(s))
            t0 = time.perf_counter()
            np.asarray(empty(s))
            t_empty = time.perf_counter() - t0
            times = []
            for _ in range(REPS):
                t0 = time.perf_counter()
                np.asarray(fn(s, o))
                times.append(time.perf_counter() - t0)
            best = min(times) - t_empty
            rate = SCAN_STEPS * b / best
            results[(label, b)] = rate
            print(f"{label} batch {b}: {rate:.1f} pairs/s "
                  f"({best / SCAN_STEPS * 1e3:.1f} ms/step)", flush=True)

    # per-op trace at the chosen batch, both precisions
    for label, step in (("f32", f32_step), ("int8", int8_step),
                        ("int8_serve", int8_serve)):
        b = args.trace_batch
        s, o = inputs(b)
        fn = make_scan(step)
        np.asarray(fn(s, o))
        trace_dir = tempfile.mkdtemp(prefix=f"witw_base_{label}_")
        jax.profiler.start_trace(trace_dir)
        np.asarray(fn(s, o))
        jax.profiler.stop_trace()
        print(f"\n--- {label} per-op attribution (batch {b}, "
              f"{SCAN_STEPS}-step scan) ---", flush=True)
        parse_trace(trace_dir, args.top, SCAN_STEPS, b)
        shutil.rmtree(trace_dir, ignore_errors=True)

    print("\nSUMMARY " + " ".join(
        f"{l}_b{b}={r:.1f}" for (l, b), r in sorted(results.items())),
        flush=True)


if __name__ == "__main__":
    main()
