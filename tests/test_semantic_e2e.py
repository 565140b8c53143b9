"""Semantic (multi-channel) data path end-to-end: mask precompute ->
4-channel TIFF tiles -> semantic CSV -> loader -> 5-channel train step."""

import os

import numpy as np
import pytest

from witw_tpu.configs import (
    DataConfig,
    DatasetConfig,
    ExperimentConfig,
    FovDsmModelConfig,
    OptimConfig,
    TrainConfig,
    semantic_experiment,
)
from witw_tpu.data import PairLoader, read_pair_paths
from witw_tpu.tools import geotiff as gt
from witw_tpu.train import make_pipeline


def test_semantic_preset_matches_reference_contract():
    cfg = semantic_experiment()
    assert cfg.data.channels == 5
    assert cfg.model.in_channels == 5
    assert cfg.model.train_first_conv  # conv1_1 trainable (cvig_semantic.py:306-309)
    assert len(cfg.data.img_mean) == 5  # extended stats (cvig_semantic.py:25-26)
    assert cfg.data.dataset.semantic
    assert cfg.train.batch_size == 32  # cvig_semantic.py:416


@pytest.mark.slow
def test_semantic_pipeline_end_to_end(tmp_path, rng):
    # --- build a 4-channel masked dataset on disk ---
    n = 4
    surface_dir = tmp_path / "surface"
    overhead_dir = tmp_path / "overhead"
    surface_dir.mkdir()
    overhead_dir.mkdir()
    rows = []
    for i in range(n):
        s = rng.integers(0, 255, (32, 64, 4), dtype=np.uint8)
        o = rng.integers(0, 255, (32, 32, 4), dtype=np.uint8)
        gt.write_geotiff_u8(str(surface_dir / f"{i}.tif"), s)
        gt.write_geotiff_u8(str(overhead_dir / f"{i}.tif"), o)
        # CSV lists .jpg paths; the semantic reader swaps to .tif siblings
        # (reference cvig_semantic.py:89-90).
        rows.append((f"surface/{i}.jpg", f"overhead/{i}.jpg"))
    csv_path = tmp_path / "scenes.csv"
    with open(csv_path, "w") as f:
        cols = [f"c{i}" for i in range(15)] + ["surface_path", "overhead_path"]
        f.write(",".join(cols) + "\n")
        for s_rel, o_rel in rows:
            f.write(",".join([""] * 15 + [s_rel, o_rel]) + "\n")

    ds = DatasetConfig(
        name="witw", train_csv=str(csv_path), test_csv=str(csv_path),
        path_columns=(15, 16), path_names=("surface", "overhead"),
        header=0, panorama=False, semantic=True,
    )
    pairs = read_pair_paths(ds, str(csv_path))
    assert all(p[0].endswith(".tif") for p in pairs)

    cfg = ExperimentConfig(
        data=DataConfig(
            dataset=ds, surface_height=32, surface_width_max=64, overhead_size=32,
            fov=360, channels=5,
            img_mean=(0.485, 0.456, 0.406, 0.45, 0.45),
            img_std=(0.229, 0.224, 0.225, 0.22, 0.22),
        ),
        model=FovDsmModelConfig(in_channels=5, train_first_conv=True, compute_dtype="float32"),
        train=TrainConfig(batch_size=2, optim=OptimConfig(learning_rate=1e-4),
                          checkpoint_dir=str(tmp_path / "ckpt")),
    )
    loader = PairLoader(
        pairs, batch_size=2, surface_hw=(32, 64), overhead_hw=(32, 32),
        channels=5, num_workers=2,
    )
    batch = next(iter(loader))
    # 4-channel TIFFs are zero-padded to the 5-channel contract
    assert batch["surface"].shape == (2, 32, 64, 5)
    assert batch["overhead"].shape == (2, 32, 32, 5)

    import jax

    pipeline = make_pipeline(cfg)
    state = pipeline.init(jax.random.PRNGKey(0))
    data = {k: batch[k] for k in ("surface", "overhead")}
    state, metrics = pipeline.train_step(state, data, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    # conv1_1 is trainable in the semantic variant
    from witw_tpu.models import fov_dsm_trainable_mask

    mask = fov_dsm_trainable_mask(state.params["surface"], cfg.model)
    assert mask["vgg"]["conv_0"]["kernel"] is True
