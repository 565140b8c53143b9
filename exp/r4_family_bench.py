#!/usr/bin/env python
"""Round 4: serving throughput of the baseline and SAFA tower families,
f32 vs static-int8, on the real TPU — the same hoist-proof scan harness as
bench.py (varying per-step inputs, value-fetch sync, empty-dispatch
subtraction). bench.py's headline covers the flagship FOV family only; this
records measured evidence that the round-4 per-family static-int8 paths
(models/quantize.py: quantize_{baseline,safa}_pipeline_static) actually pay
on device, for the BASELINE.md per-family serving table.

Geometry matches each family's production eval contract:
  baseline  surface 224x1232 raw (rows repeated x2 on device -> 448x1232),
            overhead 750x750, batch 16 (reference cvig_baseline.py:216-221,318)
  safa      surface 128x512, overhead 256^2 -> polar 128x512, batch 32

Run: PYTHONPATH=$PYTHONPATH:/root/repo python exp/r4_family_bench.py
(TPU only — XLA:CPU has no vectorized int8 conv lowering, NOTES.md;
``--smoke`` shrinks geometry/batch for a CPU glue check, numbers meaningless.)
"""

import sys
import time

import numpy as np

SCAN_STEPS = 4
REPS = 5


def measure(fn, *args):
    import jax

    np.asarray(fn(*args))  # compile + warm
    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[0], times[len(times) // 2]


def bench_family(name, batch, make_inputs, make_f32, make_int8,
                 check_only=False):
    import jax
    import jax.numpy as jnp

    surf, over = make_inputs()
    results = {}
    for label, embed_match in (("f32", make_f32()), ("int8", make_int8())):
        def scan_fn(surf, over, _f=embed_match):
            def body(c, xs):
                s, o = xs
                d = _f(s, o)
                return c, jnp.sum(d * d)  # sum of squares defeats XLA's
                # algebraic sum(conv(..)) rewrite (NOTES.md harness rules)
            _, outs = jax.lax.scan(body, 0.0, (surf, over))
            return outs

        scan_c = jax.jit(scan_fn)
        if check_only:
            # glue check: trace + lower (catches every shape/dtype error)
            # without executing — XLA:CPU int8 conv is ~150x too slow to run
            scan_c.lower(surf, over)
            print(f"{name:9s} {label:5s} lowered ok", flush=True)
            results[label] = 1.0
            continue

        @jax.jit
        def empty(surf):
            return surf[0, 0, 0, 0, 0] * 2.0

        ovh, _ = measure(empty, surf)
        best, med = measure(scan_c, surf, over)
        pairs = batch * SCAN_STEPS / max(best - ovh, 1e-6)
        pairs_med = batch * SCAN_STEPS / max(med - ovh, 1e-6)
        if pairs > 1.05 * pairs_med:
            pairs = pairs_med
        results[label] = pairs
        print(f"{name:9s} {label:5s} batch {batch}: {pairs:8.1f} pairs/s "
              f"(median {pairs_med:.1f})", flush=True)
    print(f"{name:9s} int8/f32 speedup: "
          f"{results['int8']/results['f32']:.2f}x", flush=True)
    return results


def main(smoke: bool = False):
    global SCAN_STEPS, REPS
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    if smoke:
        SCAN_STEPS, REPS = 2, 1
    else:
        assert jax.devices()[0].platform != "cpu", "TPU only (NOTES.md int8-CPU)"

    from witw_tpu.configs import baseline_experiment, safa_experiment
    from witw_tpu.match.losses import pairwise_sq_distances
    from witw_tpu.train.pipeline import make_pipeline

    rng = np.random.default_rng(0)

    # ---------------- baseline family ----------------
    b_cfg = baseline_experiment(dataset="cvusa")
    b_pipe = make_pipeline(b_cfg)
    # encoder floor is 382 px after the on-device row repeat (test_models)
    b_surf_hw, b_over_hw = ((192, 400), (384, 384)) if smoke else ((224, 1232), (750, 750))
    b_state = b_pipe.init(
        jax.random.PRNGKey(0), surface_hw=b_surf_hw, overhead_hw=b_over_hw)
    np.asarray(jax.tree.leaves(b_state.params)[0])
    B = 1 if smoke else 16

    def b_inputs():
        s = jnp.asarray(rng.uniform(
            0, 255, (SCAN_STEPS, B, *b_surf_hw, 3)).astype(np.float32))
        o = jnp.asarray(rng.uniform(
            0, 255, (SCAN_STEPS, B, *b_over_hw, 3)).astype(np.float32))
        return s, o

    def b_f32():
        def f(s, o):
            surf, over = b_pipe._preprocess(
                {"surface": s, "overhead": o}, jax.random.PRNGKey(0), False)
            se = b_pipe.surface_model.apply(
                {"params": b_state.params["surface"],
                 "batch_stats": b_state.batch_stats["surface"]},
                surf, train=False)
            oe = b_pipe.overhead_model.apply(
                {"params": b_state.params["overhead"],
                 "batch_stats": b_state.batch_stats["overhead"]},
                over, train=False)
            return pairwise_sq_distances(oe, se)
        return f

    def b_int8():
        from witw_tpu.models.quantize import (
            quantize_baseline_pipeline_static,
            quantized_baseline_forward_static,
        )
        cs = rng.uniform(0, 255, (2, *b_surf_hw, 3)).astype(np.float32)
        co = rng.uniform(0, 255, (2, *b_over_hw, 3)).astype(np.float32)
        cs_p, co_p = b_pipe._preprocess(
            {"surface": cs, "overhead": co}, jax.random.PRNGKey(0), False)
        sq_s, sq_o = quantize_baseline_pipeline_static(
            b_state, [(np.asarray(cs_p), np.asarray(co_p))])

        def f(s, o):
            surf, over = b_pipe._preprocess(
                {"surface": s, "overhead": o}, jax.random.PRNGKey(0), False)
            se = quantized_baseline_forward_static(sq_s, surf)
            oe = quantized_baseline_forward_static(sq_o, over)
            return pairwise_sq_distances(oe, se)
        return f

    r_base = bench_family("baseline", B, b_inputs, b_f32, b_int8,
                          check_only=smoke)

    # ---------------- SAFA family ----------------
    s_cfg = safa_experiment(dataset="cvusa", fov=360)
    if smoke:
        import dataclasses
        s_cfg = s_cfg.replace(data=dataclasses.replace(
            s_cfg.data, surface_height=32, surface_width_max=64,
            overhead_size=32))
    s_pipe = make_pipeline(s_cfg)
    s_state = s_pipe.init(jax.random.PRNGKey(0))
    np.asarray(jax.tree.leaves(s_state.params)[0])
    d = s_cfg.data
    S = 2 if smoke else 32

    def s_inputs():
        s = jnp.asarray(rng.uniform(
            0, 255,
            (SCAN_STEPS, S, d.surface_height, d.surface_width_max, 3)
        ).astype(np.float32))
        o = jnp.asarray(rng.uniform(
            0, 255, (SCAN_STEPS, S, d.overhead_size, d.overhead_size, 3)
        ).astype(np.float32))
        return s, o

    def s_f32():
        def f(s, o):
            surf, polar = s_pipe._preprocess(
                {"surface": s, "overhead": o}, jax.random.PRNGKey(0), False)
            se = s_pipe.surface_model.apply(
                {"params": s_state.params["surface"]}, surf)
            oe = s_pipe.overhead_model.apply(
                {"params": s_state.params["overhead"]}, polar)
            return pairwise_sq_distances(oe, se)
        return f

    def s_int8():
        from witw_tpu.models.quantize import (
            quantize_safa_pipeline_static,
            quantized_safa_forward_static,
        )
        cs = rng.uniform(
            0, 255, (2, d.surface_height, d.surface_width_max, 3)
        ).astype(np.float32)
        co = rng.uniform(
            0, 255, (2, d.overhead_size, d.overhead_size, 3)
        ).astype(np.float32)
        cs_p, co_p = s_pipe._preprocess(
            {"surface": cs, "overhead": co}, jax.random.PRNGKey(0), False)
        (sq_s, head_s), (sq_o, head_o) = quantize_safa_pipeline_static(
            s_state, [(np.asarray(cs_p), np.asarray(co_p))])

        def f(s, o):
            surf, polar = s_pipe._preprocess(
                {"surface": s, "overhead": o}, jax.random.PRNGKey(0), False)
            se = quantized_safa_forward_static(sq_s, head_s, surf, False)
            oe = quantized_safa_forward_static(sq_o, head_o, polar, True)
            return pairwise_sq_distances(oe, se)
        return f

    r_safa = bench_family("safa", S, s_inputs, s_f32, s_int8,
                          check_only=smoke)

    print("SUMMARY "
          f"baseline f32={r_base['f32']:.1f} int8={r_base['int8']:.1f} | "
          f"safa f32={r_safa['f32']:.1f} int8={r_safa['int8']:.1f} pairs/s",
          flush=True)


if __name__ == "__main__":
    main(smoke="--smoke" in sys.argv[1:])
