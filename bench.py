#!/usr/bin/env python
"""Benchmark: embed+match throughput (image pairs/sec/chip) on real hardware.

North-star metric (BASELINE.json): image pairs/sec/chip for the FOV-DSM
embed+match path at CVUSA geometry — both towers' forward (surface 128x512,
overhead polar-transformed on device from a 256^2 tile, batch 64) plus the
full in-batch circular correlation + orientation-aligned chord distance.

Measurement notes:
- K forward steps are fused into one dispatch via lax.scan so the number
  reflects device throughput, not host/tunnel dispatch latency (the axon
  test harness adds ~45 ms per dispatch that a local TPU host does not).
- Synchronization is a value fetch (np.asarray) — under the axon tunnel
  block_until_ready does not reliably wait.

vs_baseline: the reference publishes no numbers (BASELINE.md); the divisor is
a documented engineering estimate of the PyTorch reference on a V100
(twin VGG16 towers forward at these shapes + correlation matching):
~300 pairs/s. BASELINE.json's target is >=10x that per chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np

V100_REFERENCE_PAIRS_PER_SEC = 300.0  # documented estimate, see module docstring
BATCH = 64
SCAN_STEPS = 10
REPS = 3


def main():
    import jax
    import jax.numpy as jnp

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
    batch = {
        "surface": jnp.asarray(
            rng.uniform(0, 255, (BATCH, d.surface_height, d.surface_width_max, 3)).astype(
                np.float32
            )
        ),
        "overhead": jnp.asarray(
            rng.uniform(0, 255, (BATCH, d.overhead_size, d.overhead_size, 3)).astype(
                np.float32
            )
        ),
    }

    def embed_match(params, batch):
        surface, polar = pipeline._preprocess(batch, jax.random.PRNGKey(0), train=False)
        s_emb = pipeline.surface_model.apply({"params": params["surface"]}, surface)
        o_emb = pipeline.overhead_model.apply({"params": params["overhead"]}, polar)
        corr = circular_correlation(o_emb, s_emb)
        distance, _ = chord_distance(o_emb, s_emb, corr)
        return distance

    @jax.jit
    def scan_steps(params, batch):
        def body(carry, _):
            return carry, embed_match(params, batch).sum()
        _, outs = jax.lax.scan(body, 0, None, length=SCAN_STEPS)
        return outs

    np.asarray(scan_steps(state.params, batch))  # compile + first run
    best = float("inf")
    for _ in range(REPS):
        start = time.perf_counter()
        out = scan_steps(state.params, batch)
        np.asarray(out)  # hard sync
        best = min(best, time.perf_counter() - start)

    pairs_per_sec = BATCH * SCAN_STEPS / best
    print(
        json.dumps(
            {
                "metric": (
                    "embed+match image pairs/sec/chip "
                    "(FOV-DSM twin towers + circular correlation + chord distance, "
                    "CVUSA geometry, batch 64, device-side)"
                ),
                "value": round(pairs_per_sec, 2),
                "unit": "pairs/s",
                "vs_baseline": round(pairs_per_sec / V100_REFERENCE_PAIRS_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
