"""Train-loop smoke tests: loss decreases, checkpoint roundtrip, resume,
end-to-end test() metrics (the BASELINE.json CPU-runnable subset config)."""

import dataclasses

import numpy as np
import jax
import pytest

from witw_tpu.configs import (
    DataConfig,
    DatasetConfig,
    EvalConfig,
    ExperimentConfig,
    FovDsmModelConfig,
    BaselineModelConfig,
    MatchConfig,
    OptimConfig,
    TrainConfig,
)
from witw_tpu.data import SyntheticPairs
from witw_tpu.train import Checkpointer, make_pipeline
from witw_tpu.train.loop import run_phase, test as run_test, train as run_train


def tiny_fov_cfg(tmpdir, fov=360):
    ds = DatasetConfig(
        name="cvusa", train_csv="", test_csv="", panorama=True
    )
    return ExperimentConfig(
        data=DataConfig(
            dataset=ds, surface_height=32, surface_width_max=64, overhead_size=32,
            fov=fov,
        ),
        model=FovDsmModelConfig(compute_dtype="float32"),
        match=MatchConfig(),
        train=TrainConfig(
            batch_size=4,
            optim=OptimConfig(learning_rate=1e-4),
            checkpoint_dir=str(tmpdir / "ckpt"),
            tensorboard_dir=str(tmpdir / "runs"),
        ),
        eval=EvalConfig(batch_size=4, query_block=4),
    )


def tiny_loader(n=8, batch=4, surface_hw=(32, 64), overhead_hw=(32, 32), **kw):
    return SyntheticPairs(n, batch, surface_hw=surface_hw, overhead_hw=overhead_hw, **kw)


def test_straggler_batch_is_sharded_and_loss_matches(tmp_path):
    """A batch not divisible by the data axis takes the SHARDED path (padded
    to the axis multiple + bool valid mask) instead of an unsharded
    one-device placement, and the masked loss / embeddings are exactly the
    unpadded batch's (VERDICT r2 weak #6)."""
    from witw_tpu.parallel import make_mesh
    from witw_tpu.train.loop import device_prefetch, embed_all

    cfg = tiny_fov_cfg(tmp_path)
    pipeline = make_pipeline(cfg)
    state = pipeline.init(jax.random.PRNGKey(0))
    mesh = make_mesh(n_data=8)

    loader = tiny_loader(n=10, batch=16)  # one straggler batch of 10
    (batch, count), = list(device_prefetch(loader, mesh))
    assert count == 10
    assert batch["surface"].shape[0] == 16  # padded to the 8-device multiple
    assert int(np.sum(np.asarray(batch["valid"]))) == 10
    # really sharded over all 8 devices (not committed to one device)
    assert len(batch["surface"].sharding.device_set) == 8
    assert len(batch["valid"].sharding.device_set) == 8

    import jax.numpy as jnp

    rng = jax.random.PRNGKey(7)
    padded_loss = float(pipeline.eval_step(state, batch, rng)["loss"])
    raw = {"surface": jnp.asarray(loader.surface), "overhead": jnp.asarray(loader.overhead)}
    unpadded_loss = float(pipeline.eval_step(state, raw, rng)["loss"])
    np.testing.assert_allclose(padded_loss, unpadded_loss, rtol=1e-5, atol=1e-7)

    # embed_all drops the padded rows and matches the unsharded path
    s_m, o_m = embed_all(pipeline, state, loader, mesh=mesh)
    s_1, o_1 = embed_all(pipeline, state, loader, mesh=None)
    assert s_m.shape[0] == 10
    np.testing.assert_allclose(s_m, s_1, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(o_m, o_1, rtol=1e-4, atol=1e-5)


def test_fov_train_loss_decreases(tmp_path):
    cfg = tiny_fov_cfg(tmp_path)
    pipeline = make_pipeline(cfg)
    loader = tiny_loader(n=8, batch=4, shuffle=True, drop_last=True, seed=3)
    rng = jax.random.PRNGKey(0)
    state = pipeline.init(rng)
    _, first_loss, _ = run_phase(pipeline, state, loader, rng, False, 0, verbose=False)
    for epoch in range(5):
        rng, sub = jax.random.split(rng)
        state, _, _ = run_phase(pipeline, state, loader, sub, True, epoch, verbose=False)
    _, last_loss, _ = run_phase(pipeline, state, loader, rng, False, 0, verbose=False)
    assert np.isfinite(first_loss) and np.isfinite(last_loss)
    assert last_loss < first_loss


def test_fov_train_and_test_end_to_end(tmp_path):
    cfg = tiny_fov_cfg(tmp_path)
    pipeline = make_pipeline(cfg)
    train_loader = tiny_loader(n=8, batch=4, shuffle=True, drop_last=True)
    val_loader = tiny_loader(n=4, batch=4, seed=9)
    state = run_train(cfg, pipeline, train_loader, val_loader, num_epochs=2, verbose=False)
    assert int(state.step) == 4
    ckpt = Checkpointer(cfg.train.checkpoint_dir)
    assert ckpt.exists("best") and ckpt.exists("latest")

    results = run_test(cfg, pipeline, tiny_loader(n=8, batch=4), verbose=False)
    assert results["locations"] == 8
    assert 0 <= results["top_1"] <= 100
    assert results["avg_rank"] >= 1


def test_train_resume(tmp_path):
    cfg = tiny_fov_cfg(tmp_path)
    pipeline = make_pipeline(cfg)
    train_loader = tiny_loader(n=8, batch=4, drop_last=True)
    val_loader = tiny_loader(n=4, batch=4)
    state1 = run_train(cfg, pipeline, train_loader, val_loader, num_epochs=1, verbose=False)
    # Second invocation resumes from epoch 1 and runs just epoch 2.
    state2 = run_train(cfg, pipeline, train_loader, val_loader, num_epochs=2, verbose=False)
    assert int(state2.step) == int(state1.step) + 2
    # Resume is EXACT: per-epoch rngs are folded from the epoch number (not a
    # restart-sensitive sequential stream), so crash+resume equals an
    # uninterrupted run bitwise.
    import os

    cfg_fresh = tiny_fov_cfg(tmp_path / "fresh")
    os.makedirs(tmp_path / "fresh", exist_ok=True)
    state3 = run_train(cfg_fresh, make_pipeline(cfg_fresh), train_loader,
                       val_loader, num_epochs=2, verbose=False)
    max_diff = max(jax.tree.leaves(jax.tree.map(
        lambda a, b: float(np.max(np.abs(np.asarray(a) - np.asarray(b)))),
        state2.params, state3.params)))
    assert max_diff == 0.0, max_diff


def test_frozen_backbone_params_not_updated(tmp_path):
    cfg = tiny_fov_cfg(tmp_path)
    pipeline = make_pipeline(cfg)
    loader = tiny_loader(n=4, batch=4)
    rng = jax.random.PRNGKey(0)
    state = pipeline.init(rng)
    before = np.asarray(state.params["surface"]["vgg"]["conv_0"]["kernel"])
    before_trainable = np.asarray(state.params["surface"]["conv_27"]["kernel"])
    for batch in loader:
        data = {k: batch[k] for k in ("surface", "overhead")}
        state, _ = pipeline.train_step(state, data, rng)
    after = np.asarray(state.params["surface"]["vgg"]["conv_0"]["kernel"])
    after_trainable = np.asarray(state.params["surface"]["conv_27"]["kernel"])
    np.testing.assert_array_equal(before, after)  # frozen
    assert not np.allclose(before_trainable, after_trainable)  # trained


@pytest.mark.slow
def test_baseline_train_smoke(tmp_path):
    ds = DatasetConfig(
        name="witw", train_csv="", test_csv="", panorama=False, header=0,
        path_columns=(15, 16), path_names=("surface", "overhead"),
    )
    cfg = ExperimentConfig(
        data=DataConfig(dataset=ds),
        model=BaselineModelConfig(compute_dtype="float32"),
        train=TrainConfig(batch_size=2, optim=OptimConfig(learning_rate=1e-3),
                          checkpoint_dir=str(tmp_path / "ckpt")),
    )
    pipeline = make_pipeline(cfg)
    loader = tiny_loader(n=4, batch=2, surface_hw=(384, 384), overhead_hw=(384, 384))
    rng = jax.random.PRNGKey(0)
    state = pipeline.init(rng, surface_hw=(384, 384), overhead_hw=(384, 384))
    state, metrics = None or (state, None)
    for batch in loader:
        data = {k: batch[k] for k in ("surface", "overhead")}
        state, metrics = pipeline.train_step(state, data, rng)
    assert np.isfinite(float(metrics["loss"]))
    assert int(state.step) == 2
    # The EVAL path must work too (regression: flax apply(mutable=[]) on the
    # train=False branch returned (out, {}) tuples that fed the loss —
    # crashing every baseline val phase / test() / embed pass; mutable must
    # be False when frozen). run_phase(train=False) is the val-loop surface.
    ev = pipeline.eval_step(state, data, rng)
    assert np.isfinite(float(ev["loss"]))
    _, val_loss, _ = run_phase(pipeline, state, loader, rng, False, 0,
                               verbose=False)
    assert np.isfinite(val_loss)
    # and the full retrieval test() (embed_step -> euclidean ranks)
    m = run_test(cfg, pipeline, loader, state=state, verbose=False)
    assert m["locations"] == 4 and np.isfinite(m["avg_rank"])


def test_baseline_padded_rows_do_not_shift_batchnorm(tmp_path):
    """Zero-padded straggler rows must not contaminate train-mode BatchNorm:
    the valid mask is threaded into the encoder's BN stats, so a padded
    train_step produces EXACTLY the unpadded batch's loss, running
    batch_stats, and parameter updates (not just a masked loss)."""
    import jax.numpy as jnp

    ds = DatasetConfig(
        name="witw", train_csv="", test_csv="", panorama=False, header=0,
        path_columns=(15, 16), path_names=("surface", "overhead"),
    )
    cfg = ExperimentConfig(
        data=DataConfig(dataset=ds),
        model=BaselineModelConfig(compute_dtype="float32"),
        train=TrainConfig(batch_size=3, optim=OptimConfig(learning_rate=1e-3),
                          checkpoint_dir=str(tmp_path / "ckpt")),
    )
    pipeline = make_pipeline(cfg)
    state = pipeline.init(jax.random.PRNGKey(0), surface_hw=(384, 384),
                          overhead_hw=(384, 384))

    rng = np.random.default_rng(3)
    surface = rng.uniform(0, 255, (3, 384, 384, 3)).astype(np.float32)
    overhead = rng.uniform(0, 255, (3, 384, 384, 3)).astype(np.float32)
    unpadded = {"surface": jnp.asarray(surface), "overhead": jnp.asarray(overhead)}
    padded = {
        "surface": jnp.asarray(np.pad(surface, [(0, 1), (0, 0), (0, 0), (0, 0)])),
        "overhead": jnp.asarray(np.pad(overhead, [(0, 1), (0, 0), (0, 0), (0, 0)])),
        "valid": jnp.asarray(np.array([True, True, True, False])),
    }

    step_rng = jax.random.PRNGKey(11)
    # train_step donates the state buffers — give each call its own copy.
    state_copy = jax.tree.map(jnp.copy, state)
    s_u, m_u = pipeline.train_step(state_copy, unpadded, step_rng)
    s_p, m_p = pipeline.train_step(state, padded, step_rng)

    # threefry per-row randomness is prefix-stable, so the real rows see the
    # same synced-rotation angles in both shapes. Tolerances: masked-BN sums
    # reduce over 4 rows (one zero) vs 3, so f32 rounding cascades through 7
    # BN layers to ~1e-5 rel (measured); WITHOUT the mask a quarter of the
    # batch is constant input, shifting the statistics (and loss) by orders
    # of magnitude more.
    np.testing.assert_allclose(float(m_p["loss"]), float(m_u["loss"]),
                               rtol=1e-4)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                rtol=1e-3, atol=1e-6),
        s_p.batch_stats, s_u.batch_stats,
    )

    # Gradients (not post-Adam params: at step 1 Adam moves EVERY element
    # +-lr via m/sqrt(v) ~ sign(g), so ~zero-gradient elements flip sign on
    # f32 noise and params can't discriminate). Masked-BN grads must match
    # the unpadded batch's to reduction-order rounding; an unmasked BN shift
    # perturbs every gradient at O(%) scale.
    grad_fn = jax.jit(
        lambda p, bs, b: jax.grad(
            lambda pp: pipeline._forward_loss(pp, bs, b, step_rng, train=True)[0]
        )(p)
    )
    g_u = grad_fn(s_u.params, s_u.batch_stats, unpadded)  # any shared weights
    g_p = grad_fn(s_u.params, s_u.batch_stats, padded)

    def _grads_close(a, b):
        a = np.asarray(a, np.float64).ravel()
        b = np.asarray(b, np.float64).ravel()
        assert np.linalg.norm(a - b) <= 1e-3 * np.linalg.norm(b) + 1e-9

    jax.tree.map(_grads_close, g_p, g_u)


@pytest.mark.slow
def test_baseline_orientation_maps_smoke(tmp_path):
    """Baseline pipeline with the live orientation-map channels enabled."""
    ds = DatasetConfig(
        name="witw", train_csv="", test_csv="", panorama=False, header=0,
        path_columns=(15, 16), path_names=("surface", "overhead"),
    )
    cfg = ExperimentConfig(
        data=DataConfig(dataset=ds),
        model=BaselineModelConfig(compute_dtype="float32", orientation_maps=True),
        train=TrainConfig(batch_size=2, checkpoint_dir=str(tmp_path / "ckpt")),
    )
    pipeline = make_pipeline(cfg)
    import jax as _jax
    state = pipeline.init(_jax.random.PRNGKey(0), surface_hw=(384, 384), overhead_hw=(384, 384))
    assert state.params["surface"]["conv1"]["kernel"].shape[2] == 5
    loader = tiny_loader(n=2, batch=2, surface_hw=(384, 384), overhead_hw=(384, 384))
    batch = next(iter(loader))
    data = {k: batch[k] for k in ("surface", "overhead")}
    state, metrics = pipeline.train_step(state, data, _jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))


def test_sigterm_checkpoints_and_stops(tmp_path):
    """SIGTERM mid-training finishes the phase, checkpoints, returns; a rerun
    resumes from the saved state (preemption safety the reference lacks)."""
    import os
    import signal
    import threading

    cfg = tiny_fov_cfg(tmp_path)
    pipeline = make_pipeline(cfg)
    train_loader = tiny_loader(n=8, batch=4, drop_last=True)
    val_loader = tiny_loader(n=4, batch=4)

    timer = threading.Timer(0.5, lambda: os.kill(os.getpid(), signal.SIGTERM))
    timer.start()
    state = run_train(
        cfg, pipeline, train_loader, val_loader, num_epochs=50,
        verbose=False, handle_signals=True,
    )
    timer.cancel()
    steps_done = int(state.step)
    assert 0 < steps_done < 100  # stopped well before 50 epochs
    ckpt = Checkpointer(cfg.train.checkpoint_dir)
    assert ckpt.exists("latest")
    # default SIGTERM disposition restored
    assert signal.getsignal(signal.SIGTERM) in (signal.SIG_DFL, signal.default_int_handler)


def test_checkpointer_retention(tmp_path):
    """step_N checkpoints are garbage-collected beyond `keep`."""
    import jax.numpy as jnp

    ckpt = Checkpointer(str(tmp_path), keep=2)
    state = {"w": jnp.zeros((2,))}
    for step in (1, 2, 3, 4):
        ckpt.save_step(state, step)
    assert not ckpt.exists("step_1") and not ckpt.exists("step_2")
    assert ckpt.exists("step_3") and ckpt.exists("step_4")
    assert ckpt.exists("latest")
    meta = ckpt.meta("latest")
    assert meta["step"] == 4


def test_val_embedding_projector_dump(tmp_path):
    """The val-phase projector dump (reference cvig_fov.py:475-479) lands
    real projector data in the TensorBoard logdir."""
    import glob
    import os

    from witw_tpu.train.loop import dump_val_embeddings
    from witw_tpu.train.metrics import MetricWriter

    cfg = tiny_fov_cfg(tmp_path)
    pipeline = make_pipeline(cfg)
    state = pipeline.init(jax.random.PRNGKey(0))
    val_loader = tiny_loader(n=4, batch=4, seed=9)
    logdir = str(tmp_path / "runs")
    writer = MetricWriter(logdir)
    dump_val_embeddings(pipeline, state, val_loader, writer, epoch=0,
                        rng=jax.random.PRNGKey(1))
    writer.close()
    # tensorboardX writes projector_config.pbtxt + tensor tsvs per dump
    pbtxt = glob.glob(os.path.join(logdir, "**", "projector_config.pbtxt"),
                      recursive=True)
    tensors = glob.glob(os.path.join(logdir, "**", "tensors.tsv"), recursive=True)
    assert pbtxt and tensors, os.listdir(logdir)
    # 2B rows (surface + aligned overhead), each a flattened feature map
    rows = open(tensors[0]).read().strip().split("\n")
    assert len(rows) == 8


def test_checkpointer_multihost_single_writer(tmp_path, monkeypatch):
    """On a (mocked) multi-process run only process 0 writes; other processes
    neither create files nor race on latest.msgpack."""
    from witw_tpu.train.checkpoint import Checkpointer

    cfg = tiny_fov_cfg(tmp_path)
    pipeline = make_pipeline(cfg)
    state = pipeline.init(jax.random.PRNGKey(0))

    monkeypatch.setattr(jax, "process_index", lambda: 1)
    ck1 = Checkpointer(str(tmp_path / "mh"))
    assert ck1.save("latest", state, {"step": 0}) is None
    ck1.save_step(state, 1)
    assert not (tmp_path / "mh").exists()  # non-zero process created nothing

    monkeypatch.setattr(jax, "process_index", lambda: 0)
    ck0 = Checkpointer(str(tmp_path / "mh"))
    assert ck0.save("latest", state, {"step": 0}) is not None
    assert (tmp_path / "mh" / "latest.msgpack").exists()
    # every process can restore what process 0 wrote
    monkeypatch.setattr(jax, "process_index", lambda: 1)
    restored = Checkpointer(str(tmp_path / "mh")).restore_latest(state)
    assert restored is not None


def test_async_checkpointer_roundtrip(tmp_path):
    """async_saves: step/latest writes land on the background thread; a
    restore right after sees the finished file."""
    from witw_tpu.train.checkpoint import Checkpointer

    cfg = tiny_fov_cfg(tmp_path)
    pipeline = make_pipeline(cfg)
    state = pipeline.init(jax.random.PRNGKey(0))
    ck = Checkpointer(str(tmp_path / "ac"), keep=2, async_saves=True)
    for step in (1, 2, 3, 4):
        ck.save_step(state.replace(step=step), step)
    restored = ck.restore_latest(state)
    assert restored is not None and int(restored.step) == 4
    ck.wait()
    import os

    steps = sorted(
        f for f in os.listdir(tmp_path / "ac")
        if f.startswith("step_") and f.endswith(".msgpack")
    )
    assert steps == ["step_3.msgpack", "step_4.msgpack"]  # retention GC ran
