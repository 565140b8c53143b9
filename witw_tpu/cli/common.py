"""Shared CLI runner: dataset loaders + train/test drivers.

Reproduces the reference entry-point behavior (reference
model/cvig_fov.py:580-601): ``--mode {train,test} --dataset {cvusa,witw}``
(+ ``--fov`` for the fov/semantic models), reading the same CSV locations
(configurable here instead of hard-coded, SURVEY.md §5.6).
"""

from __future__ import annotations

import argparse
import os
from typing import Optional, Tuple

from witw_tpu.configs.base import ExperimentConfig, BaselineModelConfig
from witw_tpu.data.csv_registry import read_pair_paths
from witw_tpu.data.loader import PairLoader, split_train_val
from witw_tpu.train.checkpoint import Checkpointer
from witw_tpu.train.metrics import MetricWriter
from witw_tpu.train.pipeline import make_pipeline
from witw_tpu.train import loop


def host_geometry(cfg: ExperimentConfig) -> Tuple[Tuple[int, int], Tuple[int, int]]:
    """Canonical decode geometry shipped host->device per model family."""
    d = cfg.data
    if isinstance(cfg.model, BaselineModelConfig):
        # Baseline: CVUSA surfaces stay native 224x1232 (rows repeated
        # on-device, reference cvig_baseline.py:216-218); WITW surfaces are
        # resized to 500x500 (cvig_baseline.py:219-221); overhead tiles are
        # used at native 750x750.
        if d.dataset.name == "cvusa":
            return (224, 1232), (750, 750)
        return (500, 500), (750, 750)
    surface_w = d.surface_width_max if d.dataset.panorama else d.surface_width
    return (d.surface_height, surface_w), (d.overhead_size, d.overhead_size)


def build_loader(cfg: ExperimentConfig, pairs, shuffle, drop_last, batch_size=None) -> PairLoader:
    surface_hw, overhead_hw = host_geometry(cfg)
    return PairLoader(
        pairs,
        batch_size=batch_size or cfg.train.batch_size,
        surface_hw=surface_hw,
        overhead_hw=overhead_hw,
        channels=cfg.data.channels,
        shuffle=shuffle,
        drop_last=drop_last,
        num_workers=cfg.data.num_workers,
        seed=cfg.train.seed,
        prefetch=cfg.data.prefetch,
    )


def _auto_mesh(batch_size: int):
    """Data mesh over all local devices when the batch divides evenly;
    single-device runs (and awkward batch sizes) stay unsharded."""
    import jax

    from witw_tpu.parallel.mesh import make_mesh

    n = jax.device_count()
    if n > 1 and batch_size % n == 0:
        return make_mesh(n_data=n)
    return None


def run_train(
    cfg: ExperimentConfig,
    tag: str,
    num_epochs: Optional[int] = None,
    profile_dir: Optional[str] = None,
):
    from witw_tpu.utils.platform import honor_platform_env
    from witw_tpu.utils.profiling import trace_profile

    honor_platform_env()

    pairs = read_pair_paths(cfg.data.dataset, cfg.data.dataset.train_csv)
    train_pairs, val_pairs = split_train_val(pairs, cfg.train.val_quantity, cfg.train.seed)
    train_loader = build_loader(cfg, train_pairs, shuffle=True, drop_last=True)
    val_loader = build_loader(cfg, val_pairs, shuffle=False, drop_last=False)
    pipeline = make_pipeline(cfg)
    ckpt = Checkpointer(os.path.join(cfg.train.checkpoint_dir, tag), cfg.train.keep_checkpoints,
                        async_saves=cfg.train.async_checkpoints)
    writer = MetricWriter(os.path.join(cfg.train.tensorboard_dir, tag, "train"))
    with trace_profile(profile_dir):
        return loop.train(
            cfg, pipeline, train_loader, val_loader,
            num_epochs=num_epochs, mesh=_auto_mesh(cfg.train.batch_size),
            checkpointer=ckpt, writer=writer,
            handle_signals=True,
        )


def run_test(cfg: ExperimentConfig, tag: str):
    from witw_tpu.utils.platform import honor_platform_env

    honor_platform_env()
    pairs = read_pair_paths(cfg.data.dataset, cfg.data.dataset.test_csv)
    test_loader = build_loader(
        cfg, pairs, shuffle=False, drop_last=False, batch_size=cfg.eval.batch_size
    )
    pipeline = make_pipeline(cfg)
    ckpt = Checkpointer(os.path.join(cfg.train.checkpoint_dir, tag))
    writer = MetricWriter(os.path.join(cfg.train.tensorboard_dir, tag, "test"))
    return loop.test(
        cfg, pipeline, test_loader, mesh=_auto_mesh(cfg.eval.batch_size),
        checkpointer=ckpt, writer=writer,
    )


def base_parser(with_fov: bool) -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--mode", default="train", choices=["train", "test"],
        help="Run mode. [Default = train]",
    )
    parser.add_argument(
        "--dataset", default="cvusa", choices=["cvusa", "witw"],
        help="Dataset to use. [Default = cvusa]",
    )
    if with_fov:
        parser.add_argument(
            "--fov", type=int, default=360, choices=range(6, 361), metavar="{6-360}",
            help="The field of view for cropping street level images. [Default = 360]",
        )
    parser.add_argument("--train-csv", default=None, help="Override train CSV path")
    parser.add_argument("--test-csv", default=None, help="Override test CSV path")
    parser.add_argument("--epochs", type=int, default=None, help="Epoch limit")
    parser.add_argument("--batch-size", type=int, default=None)
    parser.add_argument(
        "--profile-dir", default=None,
        help="Write a jax.profiler device trace for the run (TensorBoard-compatible)",
    )
    parser.add_argument(
        "--shard-gallery", action="store_true",
        help="Retrieval eval keeps the gallery resident, sharded over every "
             "mesh device (100k+-tile mode); default shards the query axis",
    )
    parser.add_argument(
        "--fast-eval", action="store_true",
        help="Rank sweep uses bf16 matmuls (f32 accumulation) — faster, "
             "approximate (near-tie ranks can flip); default is the exact "
             "parity path",
    )
    return parser


def apply_overrides(cfg: ExperimentConfig, args) -> ExperimentConfig:
    import dataclasses

    ds = cfg.data.dataset
    if args.train_csv or args.test_csv:
        ds = dataclasses.replace(
            ds,
            train_csv=args.train_csv or ds.train_csv,
            test_csv=args.test_csv or ds.test_csv,
        )
        cfg = cfg.replace(data=dataclasses.replace(cfg.data, dataset=ds))
    if args.batch_size:
        # --batch-size governs BOTH modes: run_test builds its loader (and
        # the auto mesh) from eval.batch_size, so mapping only the train
        # field would silently ignore the flag in test mode
        cfg = cfg.replace(
            train=dataclasses.replace(cfg.train, batch_size=args.batch_size),
            eval=dataclasses.replace(cfg.eval, batch_size=args.batch_size),
        )
    if getattr(args, "shard_gallery", False):
        cfg = cfg.replace(eval=dataclasses.replace(cfg.eval, shard_gallery=True))
    if getattr(args, "fast_eval", False):
        cfg = cfg.replace(eval=dataclasses.replace(cfg.eval, fast_matmul=True))
    return cfg
