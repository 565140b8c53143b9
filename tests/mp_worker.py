"""Worker for the REAL multi-process distributed test (not a mock).

Launched by tests/test_multiprocess.py as N separate OS processes, each with
2 virtual CPU devices, connected through jax.distributed (Gloo CPU
collectives). Exercises, across a real process boundary:

- parallel.mesh.global_batch_from_local (per-process local shards assembled
  into one global batch via jax.make_array_from_process_local_data),
- one sharded FovPipeline.train_step over the global ('data',) mesh,
- the gallery-resident shard_map + psum eval (FovGalleryEvaluator),
- a multi-host checkpoint save through the process_allgather path in
  train.checkpoint (state replicated but NOT fully addressable on any one
  process) and a restore + exact-roundtrip comparison.

Process 0 writes a JSON result file the parent compares against a
single-process reference. The reference has no distributed execution at all
(SURVEY.md §2.4); this validates the framework's multi-host claims end to
end.
"""

import json
import os
import sys

# Must run before any JAX backend initialization: each worker gets exactly
# 2 virtual CPU devices (the parent may have inherited an 8-device flag).
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = [
    f for f in os.environ.get("XLA_FLAGS", "").split()
    if "xla_force_host_platform_device_count" not in f
]
os.environ["XLA_FLAGS"] = " ".join(
    _flags + ["--xla_force_host_platform_device_count=2"]
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/witw_tpu_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main(process_id: int, num_processes: int, port: int, workdir: str) -> None:
    import numpy as np

    from witw_tpu.parallel.mesh import initialize_distributed

    initialize_distributed(
        coordinator=f"127.0.0.1:{port}",
        num_processes=num_processes,
        process_id=process_id,
    )
    assert jax.process_count() == num_processes
    assert len(jax.local_devices()) == 2

    import jax.numpy as jnp  # noqa: F401
    from jax.sharding import NamedSharding, PartitionSpec as P

    from tests.mp_common import make_tiny_experiment, tiny_global_batch
    from witw_tpu.evaluation.gallery import FovGalleryEvaluator
    from witw_tpu.parallel.mesh import global_batch_from_local, make_mesh
    from witw_tpu.train.checkpoint import Checkpointer
    from witw_tpu.train.pipeline import make_pipeline

    n_devices = len(jax.devices())
    mesh = make_mesh(n_data=n_devices)
    cfg = make_tiny_experiment(batch_size=2 * n_devices)
    pipeline = make_pipeline(cfg)
    state = pipeline.init(jax.random.PRNGKey(0))
    state = jax.device_put(state, NamedSharding(mesh, P()))

    # --- global batch from per-process local shards ---
    batch = tiny_global_batch(cfg)
    rows = cfg.train.batch_size // num_processes
    local = {
        k: v[process_id * rows:(process_id + 1) * rows] for k, v in batch.items()
    }
    gbatch = global_batch_from_local(local, mesh)
    for v in jax.tree.leaves(gbatch):
        assert v.shape[0] == cfg.train.batch_size  # global, not local, shape
        assert not v.is_fully_addressable  # really spans both processes

    # --- one sharded train step across the process boundary ---
    state, metrics = pipeline.train_step(state, gbatch, jax.random.PRNGKey(1))
    loss = float(metrics["loss"])  # replicated output: readable everywhere

    # --- gallery-resident shard_map + psum eval ---
    rng = np.random.default_rng(7)
    n = 4 * n_devices
    o_emb = rng.standard_normal((n, 1, 8, 16)).astype(np.float32)
    s_emb = rng.standard_normal((n, 1, 8, 16)).astype(np.float32)
    ev = FovGalleryEvaluator(
        mesh=mesh, query_block=n, gallery_chunk=2, shard_gallery=True
    )
    ranks = ev.ranks(o_emb, s_emb)
    ev_split = FovGalleryEvaluator(mesh=mesh, query_block=n, gallery_chunk=4)
    ranks_split = ev_split.ranks(o_emb, s_emb)

    # --- mesh-resident sharded top-k serving across the process boundary ---
    # Planted structure (each query is a noisy window of its gallery item)
    # keeps top-k index order deterministic under FFT roundoff.
    from witw_tpu.evaluation.index import GalleryIndex

    s_q = np.empty((n, 1, 5, 16), np.float32)
    for i in range(n):
        cols = [(i + j) % 8 for j in range(5)]
        s_q[i] = o_emb[i][:, cols, :] + 0.1 * rng.standard_normal((1, 5, 16))
    index = GalleryIndex(o_emb)
    index.place_sharded(mesh, gallery_chunk=2, max_k=4)
    top_i, top_d, _ = index.search_sharded(s_q, k=3)

    # --- multi-host checkpoint: every process enters the allgather ---
    ckpt = Checkpointer(os.path.join(workdir, "ckpt"))
    ckpt.save("best", state, {"val_loss": loss, "step": 1})

    # --- restore_latest broadcast: PER-HOST local checkpoint dirs, so only
    # process 0 ever sees the file — every process must still come back with
    # process 0's state (broadcast_one_to_all inside restore_latest), or a
    # resumed pod trains with divergent params ---
    ckpt_local = Checkpointer(os.path.join(workdir, f"ckpt_local_{process_id}"))
    ckpt_local.save_step(state, 7, {"epoch": 3})
    ckpt_local.wait()
    state_np = jax.tree.map(np.asarray, state)
    restored_l = ckpt_local.restore_latest(jax.tree.map(np.zeros_like, state_np))
    assert restored_l is not None, "restore_latest must find p0's checkpoint"
    latest_max = max(jax.tree.leaves(jax.tree.map(
        lambda a, b: float(np.max(np.abs(np.asarray(a) - np.asarray(b)))),
        state_np, restored_l,
    )))
    assert latest_max == 0.0, f"broadcast state diverged: {latest_max}"

    if process_id == 0:
        restored = ckpt.restore("best", jax.tree.map(np.asarray, state))
        diffs = jax.tree.map(
            lambda a, b: float(np.max(np.abs(np.asarray(a) - np.asarray(b)))),
            jax.tree.map(np.asarray, state),
            restored,
        )
        roundtrip_max = max(jax.tree.leaves(diffs))
        with open(os.path.join(workdir, "result.json"), "w") as f:
            json.dump(
                {
                    "loss": loss,
                    "ranks": np.asarray(ranks).tolist(),
                    "ranks_split": np.asarray(ranks_split).tolist(),
                    "search_i": np.asarray(top_i).tolist(),
                    "search_d": np.asarray(top_d).tolist(),
                    "ckpt_roundtrip_max_abs_diff": roundtrip_max,
                    "restore_latest_broadcast_max_abs_diff": latest_max,
                    "process_count": jax.process_count(),
                },
                f,
            )
    # All processes print a completion marker the parent can assert on.
    print(f"WORKER_{process_id}_OK", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])
