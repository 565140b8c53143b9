"""VGG16+SAFA tower family: head math, unit embeddings, training smoke."""

import numpy as np
import jax
import jax.numpy as jnp

from witw_tpu.configs import (
    DataConfig,
    DatasetConfig,
    EvalConfig,
    ExperimentConfig,
    MatchConfig,
    OptimConfig,
    SafaModelConfig,
    TrainConfig,
    safa_experiment,
)
from witw_tpu.data import SyntheticPairs
from witw_tpu.models import SafaHead, VggSafa
from witw_tpu.train import make_pipeline
from witw_tpu.train.loop import run_phase, test as run_test


def tiny_safa_cfg(tmpdir):
    ds = DatasetConfig(name="cvusa", train_csv="", test_csv="", panorama=True)
    return ExperimentConfig(
        data=DataConfig(dataset=ds, surface_height=32, surface_width_max=64,
                        overhead_size=32, fov=360),
        model=SafaModelConfig(compute_dtype="float32", num_heads=4),
        match=MatchConfig(),
        train=TrainConfig(batch_size=4, optim=OptimConfig(learning_rate=1e-4),
                          checkpoint_dir=str(tmpdir / "ckpt")),
        eval=EvalConfig(batch_size=4),
    )


def test_safa_head_math(rng):
    """The head output is exactly the attention-weighted feature sums,
    L2-normalized."""
    feats = jnp.asarray(rng.standard_normal((2, 2, 4, 8)).astype(np.float32))
    head = SafaHead(num_heads=3, dtype=jnp.float32)
    variables = head.init(jax.random.PRNGKey(0), feats)
    out = np.asarray(head.apply(variables, feats))
    assert out.shape == (2, 3 * 8)
    np.testing.assert_allclose(np.linalg.norm(out, axis=-1), 1.0, rtol=1e-5)

    # reproduce with explicit numpy (per-head MLPs: rank-3 weights, one
    # independent hw -> hw/d -> hw MLP per head as in Shi et al. 2019)
    p = jax.tree.map(np.asarray, variables["params"])
    f = np.asarray(feats).reshape(2, 8, 8)
    plan = f.max(-1)
    assert p["fc1"].shape == (8, 4, 3) and p["fc2"].shape == (4, 8, 3)
    hidden = np.einsum("bp,pqm->bqm", plan, p["fc1"]) + p["fc1_bias"]
    masks = np.einsum("bqm,qpm->bpm", hidden, p["fc2"]) + p["fc2_bias"]
    want = np.einsum("bpc,bpm->bmc", f, masks).reshape(2, -1)
    want = want / np.linalg.norm(want, axis=-1, keepdims=True)
    np.testing.assert_allclose(out, want, rtol=1e-4, atol=1e-5)


def test_safa_tower_shapes():
    cfg = SafaModelConfig(compute_dtype="float32", num_heads=4)
    model = VggSafa(cfg, circ_padding=True)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((2, 32, 64, 3)))
    out = model.apply(v, jnp.zeros((2, 32, 64, 3)))
    assert out.shape == (2, 4 * 512)  # heads x conv4_3 channels


def test_safa_train_loss_decreases_and_eval(tmp_path):
    cfg = tiny_safa_cfg(tmp_path)
    pipeline = make_pipeline(cfg)
    loader = SyntheticPairs(8, 4, surface_hw=(32, 64), overhead_hw=(32, 32),
                            shuffle=True, drop_last=True, seed=3)
    rng = jax.random.PRNGKey(0)
    state = pipeline.init(rng)
    # frozen trunk, trainable head
    from witw_tpu.models import safa_trainable_mask

    mask = safa_trainable_mask(state.params["surface"], cfg.model)
    assert mask["vgg"]["conv_0"]["kernel"] is False
    assert mask["safa"]["fc1"] is True

    _, first, _ = run_phase(pipeline, state, loader, rng, False, 0, verbose=False)
    for epoch in range(5):
        rng, sub = jax.random.split(rng)
        state, _, _ = run_phase(pipeline, state, loader, sub, True, epoch, verbose=False)
    _, last, _ = run_phase(pipeline, state, loader, rng, False, 0, verbose=False)
    assert np.isfinite(first) and np.isfinite(last)
    assert last < first

    results = run_test(cfg, pipeline, SyntheticPairs(8, 4, surface_hw=(32, 64),
                                                     overhead_hw=(32, 32)),
                       state=state, verbose=False)
    assert results["locations"] == 8
    assert results["avg_rank"] >= 1


def test_safa_yaml_roundtrip(tmp_path):
    from witw_tpu.configs.serialize import load_config, save_config

    cfg = safa_experiment(fov=180)
    path = str(tmp_path / "safa.yaml")
    save_config(cfg, path)
    assert load_config(path) == cfg
