"""Shared fixtures for the real multi-process distributed test: the tiny
experiment config and the deterministic global batch, used identically by the
single-process reference (tests/test_multiprocess.py) and every distributed
worker (tests/mp_worker.py) so their results are directly comparable."""

import numpy as np


def make_tiny_experiment(batch_size: int):
    from witw_tpu.configs import (
        DataConfig,
        DatasetConfig,
        EvalConfig,
        ExperimentConfig,
        FovDsmModelConfig,
        OptimConfig,
        TrainConfig,
    )

    ds = DatasetConfig(name="cvusa", train_csv="", test_csv="", panorama=True)
    return ExperimentConfig(
        data=DataConfig(
            dataset=ds, surface_height=32, surface_width_max=64, overhead_size=32
        ),
        model=FovDsmModelConfig(compute_dtype="float32"),
        train=TrainConfig(
            batch_size=batch_size, optim=OptimConfig(learning_rate=1e-4)
        ),
        eval=EvalConfig(query_block=batch_size),
    )


def tiny_global_batch(cfg):
    rng = np.random.default_rng(0)
    b = cfg.train.batch_size
    d = cfg.data
    return {
        "surface": rng.uniform(
            0, 255, (b, d.surface_height, d.surface_width_max, 3)
        ).astype(np.float32),
        "overhead": rng.uniform(
            0, 255, (b, d.overhead_size, d.overhead_size, 3)
        ).astype(np.float32),
    }
