"""CLI end-to-end: reference-compatible flags drive train + test on a
synthetic on-disk dataset."""

import os

import pytest

from witw_tpu.data import write_synthetic_dataset


def test_cli_overrides_plumb_through():
    """Flag -> config plumbing for the non-reference extras (--shard-gallery,
    --fast-eval, --batch-size), without running anything."""
    from witw_tpu.cli.common import apply_overrides, base_parser
    from witw_tpu.configs import fov_experiment

    parser = base_parser(with_fov=True)
    args = parser.parse_args(
        ["--fov", "90", "--batch-size", "16", "--shard-gallery", "--fast-eval"]
    )
    cfg = apply_overrides(fov_experiment(dataset="cvusa", fov=90), args)
    assert cfg.train.batch_size == 16
    assert cfg.eval.shard_gallery is True
    assert cfg.eval.fast_matmul is True

    plain = parser.parse_args(["--fov", "90"])
    cfg2 = apply_overrides(fov_experiment(dataset="cvusa", fov=90), plain)
    assert cfg2.eval.shard_gallery is False
    assert cfg2.eval.fast_matmul is False  # exact parity path is the default


@pytest.mark.slow
def test_cvig_fov_cli_train_and_test(tmp_path, monkeypatch):
    """python -m witw_tpu.cli.cvig_fov --mode train/test with CSV overrides
    (reference CLI contract, cvig_fov.py:580-601) on a tiny dataset.

    Uses full CVUSA geometry at fov=90 with 6 pairs / 1 epoch on CPU.
    """
    csv_path = write_synthetic_dataset(
        str(tmp_path / "data"), n=6, schema="cvusa",
        surface_hw=(128, 512), overhead_hw=(256, 256),
    )
    monkeypatch.chdir(tmp_path)

    from witw_tpu.cli import cvig_fov

    args = [
        "--mode", "train", "--dataset", "cvusa", "--fov", "90",
        "--train-csv", csv_path, "--test-csv", csv_path,
        "--epochs", "1", "--batch-size", "2",
    ]
    # small val split
    import dataclasses

    from witw_tpu.cli import common as cli_common
    orig_run_train = cli_common.run_train

    def run_train_small_val(cfg, tag, num_epochs=None, profile_dir=None):
        cfg = cfg.replace(train=dataclasses.replace(cfg.train, val_quantity=2))
        return orig_run_train(cfg, tag, num_epochs=num_epochs, profile_dir=profile_dir)

    monkeypatch.setattr(cvig_fov, "run_train", run_train_small_val)
    cvig_fov.main(args)
    assert os.path.exists(tmp_path / "weights" / "fov_90_cvusa" / "best.msgpack")

    cvig_fov.main(
        ["--mode", "test", "--dataset", "cvusa", "--fov", "90",
         "--train-csv", csv_path, "--test-csv", csv_path, "--batch-size", "2"]
    )
    # metrics landed in the tensorboard jsonl
    runs = tmp_path / "runs" / "fov_90_cvusa" / "test" / "metrics.jsonl"
    assert runs.exists()
    content = runs.read_text()
    assert "top_1" in content and "locations" in content
