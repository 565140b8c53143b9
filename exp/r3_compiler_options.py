"""Round 3: TPU compiler-option sweep over the serving bench graph.

XLA_FLAGS cannot carry TPU compiler flags through the axon tunnel (the
CLIENT xla parser aborts on unknown flags — they are server-side options;
see /tmp/xla_flags.log round-3 attempt). But per-computation
``lowered.compile(compiler_options=...)`` IS forwarded to the remote
compiler and validated there (a bogus option returns HTTP 500 from
tpu_compile_helper), so compiler options are a real, previously untried
axis on the pinned ~2600 pairs/s int8 serving ceiling.

Each variant compiles the SAME lowered bench graph (identical to bench.py's
scan_steps: static-int8 towers, int8-first preprocessing, batch 128, scan-8
varying inputs) with different options and times best-of-REPS with the
empty-dispatch overhead subtracted.

Run: PYTHONPATH=$PYTHONPATH:/root/repo python exp/r3_compiler_options.py
"""

import json
import time

import numpy as np

BATCH = 128
SCAN_STEPS = 8
REPS = 7

VARIANTS = [
    ("baseline", None),
    # Scoped-VMEM budget for fusion buffers. Wave 1 (twice-confirmed):
    # 32m wins +1.3-1.7% over baseline; 64m/96m LOSE ~1%; latency-hiding
    # scheduler off is a wash. Wave 2 probes around the 32m optimum.
    ("vmem_16m", {"xla_tpu_scoped_vmem_limit_kib": "16384"}),
    ("vmem_24m", {"xla_tpu_scoped_vmem_limit_kib": "24576"}),
    ("vmem_32m", {"xla_tpu_scoped_vmem_limit_kib": "32768"}),
    ("vmem_40m", {"xla_tpu_scoped_vmem_limit_kib": "40960"}),
    ("vmem_48m", {"xla_tpu_scoped_vmem_limit_kib": "49152"}),
    # reduce-window/broadcast fusion toggle (pools are 2.6 ms of the step):
    # CRASHES the remote compile helper (HTTP 500, body closed mid-read) —
    # left disabled so reruns don't destabilize the compile service.
    # ("no_rwb_fusion", {"xla_tpu_rwb_fusion": "false"}),
]


def main():
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
    surf = jnp.asarray(rng.uniform(
        0, 255, (SCAN_STEPS, BATCH, d.surface_height, d.surface_width_max, 3)
    ).astype(np.float32))
    over = jnp.asarray(rng.uniform(
        0, 255, (SCAN_STEPS, BATCH, d.overhead_size, d.overhead_size, 3)
    ).astype(np.float32))

    s_in, p_in = pipeline._preprocess(
        {"surface": surf[0][:8], "overhead": over[0][:8]},
        jax.random.PRNGKey(0), train=False,
    )
    sq_s, sq_o = quantize_pipeline_static(state, [(s_in, p_in)])

    def embed_match(params, batch):
        surface_q, polar_q = preprocess_static_int8(
            cfg.data, sq_s, sq_o, batch, jax.random.PRNGKey(0)
        )
        s_emb = quantized_fov_forward_static(sq_s, surface_q, False, x_quantized=True)
        o_emb = quantized_fov_forward_static(sq_o, polar_q, True, x_quantized=True)
        corr = circular_correlation(o_emb, s_emb)
        distance, _ = chord_distance(o_emb, s_emb, corr)
        return distance

    def scan_steps(params, surf, over):
        def body(carry, xs):
            s, o = xs
            return carry, embed_match(params, {"surface": s, "overhead": o}).sum()
        _, outs = jax.lax.scan(body, 0, (surf, over))
        return outs

    def empty_dispatch(surf):
        return surf[0, 0, 0, 0, 0] * 2.0

    def measure(fn, *args):
        np.asarray(fn(*args))  # warm
        times = []
        for _ in range(REPS):
            start = time.perf_counter()
            np.asarray(fn(*args))
            times.append(time.perf_counter() - start)
        times.sort()
        return times[0], times[len(times) // 2]

    overhead, _ = measure(jax.jit(empty_dispatch), surf)
    lowered = jax.jit(scan_steps).lower(state.params, surf, over)

    results = {}
    for name, opts in VARIANTS:
        try:
            t0 = time.time()
            compiled = lowered.compile(
                compiler_options=opts) if opts else lowered.compile()
            compile_s = time.time() - t0
            best, med = measure(compiled, state.params, surf, over)
            pairs = BATCH * SCAN_STEPS / max(best - overhead, 1e-6)
            pairs_med = BATCH * SCAN_STEPS / max(med - overhead, 1e-6)
            results[name] = round(pairs, 1)
            print(f"{name}: {pairs:.1f} pairs/s (median {pairs_med:.1f}, "
                  f"compile {compile_s:.0f}s)", flush=True)
        except Exception as e:
            results[name] = None
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}",
                  flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
