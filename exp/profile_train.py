#!/usr/bin/env python
"""Per-op attribution for the training step (fwd+bwd+Adam, batch 64)."""

import sys
import tempfile

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from exp.profile_bench import parse_trace
from witw_tpu.configs import fov_experiment
from witw_tpu.train.pipeline import make_pipeline

BATCH = 64
STEPS = 4


def main():
    cfg = fov_experiment(dataset="cvusa", fov=360)
    pipeline = make_pipeline(cfg)
    state = pipeline.init(jax.random.PRNGKey(0))
    np.asarray(jax.tree.leaves(state.params)[0])
    d = cfg.data
    rng = np.random.default_rng(0)
    surf = jnp.asarray(rng.uniform(
        0, 255, (STEPS, BATCH, d.surface_height, d.surface_width_max, 3)
    ).astype(np.float32))
    over = jnp.asarray(rng.uniform(
        0, 255, (STEPS, BATCH, d.overhead_size, d.overhead_size, 3)
    ).astype(np.float32))

    @jax.jit
    def run(state, surf, over):
        def body(st, xs):
            s, o = xs
            st, metrics = pipeline.train_step(st, {"surface": s, "overhead": o},
                                              jax.random.PRNGKey(1))
            return st, metrics["loss"]
        st, losses = jax.lax.scan(body, state, (surf, over))
        return losses

    import time
    np.asarray(run(state, surf, over))
    t0 = time.perf_counter()
    np.asarray(run(state, surf, over))
    wall = time.perf_counter() - t0
    print(f"scan wall: {wall*1e3:.1f} ms ({STEPS*BATCH/wall:.0f} pairs/s incl dispatch)",
          flush=True)
    trace_dir = tempfile.mkdtemp(prefix="witw_train_trace_")
    jax.profiler.start_trace(trace_dir)
    np.asarray(run(state, surf, over))
    jax.profiler.stop_trace()
    parse_trace(trace_dir, 35, STEPS, BATCH)


if __name__ == "__main__":
    main()
