#!/usr/bin/env python
"""Per-op device-time attribution for the bench graph (real TPU).

Runs the same hoist-proof lax.scan graph as bench.py under
jax.profiler.start_trace (trace-to-file works through the axon tunnel —
NOTES.md), then parses the trace's traceEvents for per-fusion device times.

Usage: python exp/profile_bench.py [--int8] [--steps N] [--top K]
"""

import argparse
import glob
import gzip
import json
import os
import shutil
import sys
import tempfile
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build(int8: bool, batch: int, steps: int):
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    from witw_tpu.configs import fov_experiment
    from witw_tpu.match.correlation import circular_correlation
    from witw_tpu.match.distance import chord_distance
    from witw_tpu.train.pipeline import make_pipeline

    cfg = fov_experiment(dataset="cvusa", fov=360)
    pipeline = make_pipeline(cfg)
    state = pipeline.init(jax.random.PRNGKey(0))
    np.asarray(jax.tree.leaves(state.params)[0])
    d = cfg.data

    rng = np.random.default_rng(0)
    surf = jnp.asarray(
        rng.uniform(0, 255, (steps, batch, d.surface_height, d.surface_width_max, 3)).astype(
            np.float32
        )
    )
    over = jnp.asarray(
        rng.uniform(0, 255, (steps, batch, d.overhead_size, d.overhead_size, 3)).astype(np.float32)
    )

    if int8:
        from witw_tpu.models.quantize import (
            quantize_pipeline_static,
            quantized_fov_forward_static,
        )

        from witw_tpu.models.quantize import preprocess_static_int8

        s_in, p_in = pipeline._preprocess(
            {"surface": surf[0][:8], "overhead": over[0][:8]}, jax.random.PRNGKey(0), train=False
        )
        sq_s, sq_o = quantize_pipeline_static(state, [(s_in, p_in)])

        def embed_match(params, batch_d):
            surface_q, polar_q = preprocess_static_int8(
                cfg.data, sq_s, sq_o, batch_d, jax.random.PRNGKey(0)
            )
            s_emb = quantized_fov_forward_static(sq_s, surface_q, False, x_quantized=True)
            o_emb = quantized_fov_forward_static(sq_o, polar_q, True, x_quantized=True)
            corr = circular_correlation(o_emb, s_emb)
            distance, _ = chord_distance(o_emb, s_emb, corr)
            return distance
    else:

        def embed_match(params, batch_d):
            surface, polar = pipeline._preprocess(batch_d, jax.random.PRNGKey(0), train=False)
            s_emb = pipeline.surface_model.apply({"params": params["surface"]}, surface)
            o_emb = pipeline.overhead_model.apply({"params": params["overhead"]}, polar)
            corr = circular_correlation(o_emb, s_emb)
            distance, _ = chord_distance(o_emb, s_emb, corr)
            return distance

    @jax.jit
    def scan_steps(params, surf, over):
        def body(carry, xs):
            s, o = xs
            return carry, embed_match(params, {"surface": s, "overhead": o}).sum()

        _, outs = jax.lax.scan(body, 0, (surf, over))
        return outs

    return scan_steps, (state.params, surf, over)


def parse_trace(trace_dir: str, top: int, steps: int, batch: int):
    paths = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True)
    assert paths, f"no trace under {trace_dir}"
    with gzip.open(paths[0], "rt") as f:
        trace = json.load(f)
    events = trace["traceEvents"]
    # device-side complete events: pid whose process_name mentions TPU/device
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in pid_names.items() if "TPU" in n or "/device" in n}
    agg = defaultdict(lambda: [0.0, 0, ""])
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "")
        dur = e.get("dur", 0) / 1e3  # us -> ms
        a = agg[name]
        a[0] += dur
        a[1] += 1
        ln = (e.get("args") or {}).get("long_name", "")
        if ln and not a[2]:
            a[2] = ln
        total += dur
    rows = sorted(agg.items(), key=lambda kv: -kv[1][0])
    print(f"\ntotal device time: {total:.2f} ms  "
          f"({steps * batch / (total / 1e3):.0f} pairs/s if conv-only)")
    print(f"{'ms':>9} {'%':>5} {'n':>4}  name")
    for name, (ms, n, ln) in rows[:top]:
        print(f"{ms:9.3f} {100 * ms / total:5.1f} {n:4d}  {name}")
        if ln:
            print(f"{'':21}{ln[:220]}")
    return total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--int8", action="store_true")
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--keep", action="store_true", help="keep the trace dir")
    args = ap.parse_args()

    import jax

    fn, fargs = build(args.int8, args.batch, args.steps)
    np.asarray(fn(*fargs))  # compile + warm
    trace_dir = tempfile.mkdtemp(prefix="witw_trace_")
    jax.profiler.start_trace(trace_dir)
    np.asarray(fn(*fargs))
    jax.profiler.stop_trace()
    parse_trace(trace_dir, args.top, args.steps, args.batch)
    if args.keep:
        print(f"trace kept at {trace_dir}")
    else:
        shutil.rmtree(trace_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
