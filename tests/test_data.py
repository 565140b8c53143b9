"""Data layer: CSV schemas, loader decode path, converter."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from witw_tpu.configs import DATASETS, FovDsmModelConfig
from witw_tpu.data import PairLoader, read_pair_paths, split_train_val, write_synthetic_dataset


def test_cvusa_schema_roundtrip(tmp_path, rng):
    csv_path = write_synthetic_dataset(str(tmp_path), n=6, schema="cvusa",
                                       surface_hw=(32, 64), overhead_hw=(32, 32))
    pairs = read_pair_paths(DATASETS["cvusa"], csv_path)
    assert len(pairs) == 6
    surface, overhead = pairs[0]
    # cvusa CSV columns are [overhead, surface] (reference cvig_fov.py:38-44)
    assert "surface" in surface and "overhead" in overhead
    assert os.path.isabs(surface)


def test_witw_schema_roundtrip(tmp_path):
    csv_path = write_synthetic_dataset(str(tmp_path), n=4, schema="witw",
                                       surface_hw=(32, 64), overhead_hw=(32, 32))
    pairs = read_pair_paths(DATASETS["witw"], csv_path)
    assert len(pairs) == 4
    surface, overhead = pairs[0]
    assert "surface" in surface and "overhead" in overhead


def test_pair_loader_batches(tmp_path):
    csv_path = write_synthetic_dataset(str(tmp_path), n=5, schema="cvusa",
                                       surface_hw=(32, 64), overhead_hw=(32, 32))
    pairs = read_pair_paths(DATASETS["cvusa"], csv_path)
    loader = PairLoader(pairs, batch_size=2, surface_hw=(16, 32), overhead_hw=(16, 16),
                        num_workers=2, drop_last=False)
    batches = list(loader)
    assert len(batches) == 3
    assert batches[0]["surface"].shape == (2, 16, 32, 3)
    assert batches[-1]["surface"].shape == (1, 16, 32, 3)
    # drop_last
    loader2 = PairLoader(pairs, batch_size=2, surface_hw=(16, 32), overhead_hw=(16, 16),
                         num_workers=2, drop_last=True)
    assert len(list(loader2)) == 2
    assert len(loader2) == 2


def test_loader_shuffle_determinism(tmp_path):
    csv_path = write_synthetic_dataset(str(tmp_path), n=8, schema="cvusa",
                                       surface_hw=(16, 32), overhead_hw=(16, 16))
    pairs = read_pair_paths(DATASETS["cvusa"], csv_path)
    l1 = PairLoader(pairs, batch_size=4, surface_hw=(16, 32), overhead_hw=(16, 16),
                    shuffle=True, seed=7)
    l2 = PairLoader(pairs, batch_size=4, surface_hw=(16, 32), overhead_hw=(16, 16),
                    shuffle=True, seed=7)
    idx1 = [b["idx"].tolist() for b in l1]
    idx2 = [b["idx"].tolist() for b in l2]
    assert idx1 == idx2
    # next epoch differs
    idx3 = [b["idx"].tolist() for b in l1]
    assert idx1 != idx3


def test_split_train_val_partition():
    pairs = [(f"s{i}", f"o{i}") for i in range(10)]
    train, val = split_train_val(pairs, 3, seed=1)
    assert len(train) == 7 and len(val) == 3
    assert set(train) | set(val) == set(pairs)
    assert not set(train) & set(val)


def test_convert_torch_vgg_state_dict():
    """Fabricated torchvision-style VGG16 state dict -> FovDsm params, plus
    the 5-channel semantic first-conv merge (reference cvig_semantic.py:301-303)."""
    torch = pytest.importorskip("torch")
    from witw_tpu.models import FovDsm
    from witw_tpu.models.backbones.vgg16 import VGG16_CONVS
    from witw_tpu.models.convert_torch import (
        convert_fov_dsm_state_dict,
        merge_pretrained_vgg,
    )

    gen = torch.Generator().manual_seed(0)
    state = {}
    in_ch = 3
    for idx, out_ch in VGG16_CONVS:
        state[f"features.{idx}.weight"] = torch.randn(out_ch, in_ch, 3, 3, generator=gen)
        state[f"features.{idx}.bias"] = torch.randn(out_ch, generator=gen)
        in_ch = out_ch
    converted = convert_fov_dsm_state_dict(state)
    assert converted["vgg"]["conv_0"]["kernel"].shape == (3, 3, 3, 64)
    np.testing.assert_allclose(
        converted["vgg"]["conv_0"]["kernel"][..., 0, 5],
        state["features.0.weight"][5, 0].numpy(),
        rtol=1e-6,
    )

    # merge into fresh params (3-channel)
    model = FovDsm(FovDsmModelConfig(compute_dtype="float32"), circ_padding=False)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 64, 3)))
    params = jax.tree.map(np.asarray, variables["params"])
    merged = merge_pretrained_vgg(params, converted)
    np.testing.assert_allclose(
        merged["vgg"]["conv_2"]["kernel"],
        converted["vgg"]["conv_2"]["kernel"],
        rtol=1e-6,
    )
    # head convs keep their fresh init (torchvision VGG has none)
    np.testing.assert_allclose(merged["conv_23"]["kernel"], params["conv_23"]["kernel"])

    # 5-channel semantic merge: RGB weights land in first 3 input channels
    sem_model = FovDsm(
        FovDsmModelConfig(in_channels=5, train_first_conv=True, compute_dtype="float32"),
        circ_padding=False,
    )
    sem_vars = sem_model.init(jax.random.PRNGKey(1), jnp.zeros((1, 32, 64, 5)))
    sem_params = jax.tree.map(np.asarray, sem_vars["params"])
    sem_merged = merge_pretrained_vgg(sem_params, converted)
    np.testing.assert_allclose(
        sem_merged["vgg"]["conv_0"]["kernel"][:, :, :3, :],
        converted["vgg"]["conv_0"]["kernel"],
        rtol=1e-6,
    )
    np.testing.assert_allclose(
        sem_merged["vgg"]["conv_0"]["kernel"][:, :, 3:, :],
        sem_params["vgg"]["conv_0"]["kernel"][:, :, 3:, :],
    )


def test_convert_wrapped_reference_keys():
    """Reference tower checkpoints wrap convs as model.features.N.layer.*
    (HorizCircPadding/AddDropout, cvig_fov.py:212-245); the converter strips
    wrappers and picks up the head convs at indices 23/25/27."""
    torch = pytest.importorskip("torch")
    from witw_tpu.models.backbones.vgg16 import VGG16_CONVS
    from witw_tpu.models.convert_torch import convert_fov_dsm_state_dict

    gen = torch.Generator().manual_seed(0)
    state = {}
    in_ch = 3
    for idx, out_ch in VGG16_CONVS:
        prefix = f"model.features.{idx}.layer" if idx >= 17 else f"model.features.{idx}"
        state[f"{prefix}.weight"] = torch.randn(out_ch, in_ch, 3, 3, generator=gen)
        state[f"{prefix}.bias"] = torch.randn(out_ch, generator=gen)
        in_ch = out_ch
    for idx, out_ch, in_c in [(23, 256, 512), (25, 64, 256), (27, 16, 64)]:
        state[f"model.features.{idx}.layer.weight"] = torch.randn(out_ch, in_c, 3, 3, generator=gen)
        state[f"model.features.{idx}.layer.bias"] = torch.randn(out_ch, generator=gen)
    converted = convert_fov_dsm_state_dict(state)
    assert converted["conv_23"]["kernel"].shape == (3, 3, 512, 256)
    assert converted["conv_27"]["kernel"].shape == (3, 3, 64, 16)


def test_convert_torch_cli_roundtrip(tmp_path):
    """The offline converter CLI (.pth -> .npz with '/'-joined keys) preserves
    every leaf exactly through save + load + unflatten."""
    torch = pytest.importorskip("torch")
    from witw_tpu.models.backbones.vgg16 import VGG16_CONVS
    from witw_tpu.models.convert_torch import (
        convert_fov_dsm_state_dict,
        main as convert_main,
        unflatten,
    )

    gen = torch.Generator().manual_seed(0)
    state = {}
    in_ch = 3
    for idx, out_ch in VGG16_CONVS:
        state[f"features.{idx}.weight"] = torch.randn(out_ch, in_ch, 3, 3, generator=gen)
        state[f"features.{idx}.bias"] = torch.randn(out_ch, generator=gen)
        in_ch = out_ch
    src = tmp_path / "vgg.pth"
    dst = tmp_path / "vgg.npz"
    torch.save(state, str(src))
    convert_main([str(src), str(dst)])

    loaded = unflatten(dict(np.load(str(dst))))
    want = convert_fov_dsm_state_dict(state)
    for torch_idx, _ in VGG16_CONVS:
        got = loaded["vgg"][f"conv_{torch_idx}"]
        ref = want["vgg"][f"conv_{torch_idx}"]
        np.testing.assert_array_equal(got["kernel"], ref["kernel"])
        np.testing.assert_array_equal(got["bias"], np.asarray(ref["bias"]))


def test_convert_baseline_state_dict():
    torch = pytest.importorskip("torch")
    from witw_tpu.models.convert_torch import convert_baseline_state_dict

    gen = torch.Generator().manual_seed(0)
    state = {}
    chans = [(3, 64), (64, 128), (128, 256), (256, 512), (512, 512), (512, 512), (512, 512)]
    for i, (cin, cout) in enumerate(chans, start=1):
        state[f"conv{i}.weight"] = torch.randn(cout, cin, 4, 4, generator=gen)
        state[f"conv{i}.bias"] = torch.randn(cout, generator=gen)
        state[f"bn{i}.weight"] = torch.randn(cout, generator=gen)
        state[f"bn{i}.bias"] = torch.randn(cout, generator=gen)
        state[f"bn{i}.running_mean"] = torch.randn(cout, generator=gen)
        state[f"bn{i}.running_var"] = torch.rand(cout, generator=gen) + 0.5
        state[f"bn{i}.num_batches_tracked"] = torch.tensor(0)
    params, stats = convert_baseline_state_dict(state)
    assert params["conv1"]["kernel"].shape == (4, 4, 3, 64)
    assert params["bn3"]["scale"].shape == (256,)
    assert stats["bn7"]["var"].shape == (512,)


def test_config_yaml_roundtrip(tmp_path):
    """Experiment configs round-trip through YAML exactly."""
    from witw_tpu.configs import baseline_experiment, fov_experiment, semantic_experiment
    from witw_tpu.configs.serialize import load_config, save_config

    for cfg in (fov_experiment(fov=90), baseline_experiment("witw"), semantic_experiment()):
        path = str(tmp_path / "cfg.yaml")
        save_config(cfg, path)
        back = load_config(path)
        assert back == cfg


def test_loader_skip_errors(tmp_path):
    """skip_errors substitutes zero images for unreadable files."""
    csv_path = write_synthetic_dataset(str(tmp_path), n=2, schema="cvusa",
                                       surface_hw=(16, 32), overhead_hw=(16, 16))
    pairs = read_pair_paths(DATASETS["cvusa"], csv_path)
    bad = [(str(tmp_path / "missing.jpg"), pairs[0][1])] + list(pairs)
    strict = PairLoader(bad, batch_size=3, surface_hw=(16, 32), overhead_hw=(16, 16),
                        num_workers=1, worker_mode="thread")
    with pytest.raises(Exception):
        list(strict)
    lenient = PairLoader(bad, batch_size=3, surface_hw=(16, 32), overhead_hw=(16, 16),
                         num_workers=1, worker_mode="thread", skip_errors=True)
    batch = next(iter(lenient))
    assert batch["surface"].shape == (3, 16, 32, 3)
    assert np.all(batch["surface"][0] == 0)
    assert not np.all(batch["surface"][1] == 0)


def test_loader_pool_persists_across_epochs(tmp_path, rng):
    """The worker pool is created once and reused by every epoch (no
    per-epoch respawn + re-pickle; VERDICT r1 weak #5)."""
    from witw_tpu.data.loader import PairLoader
    import cv2

    paths = []
    for i in range(4):
        img = rng.integers(0, 255, (8, 8, 3), dtype=np.uint8)
        p = str(tmp_path / f"i{i}.png")
        cv2.imwrite(p, img)
        paths.append((p, p))
    loader = PairLoader(
        paths, batch_size=2, surface_hw=(8, 8), overhead_hw=(8, 8),
        num_workers=2, worker_mode="process",
    )
    batches1 = list(loader)
    pool1 = loader._pool
    assert pool1 is not None
    pids1 = {f.pid for f in pool1._processes.values()}
    batches2 = list(loader)
    assert loader._pool is pool1  # same executor object
    pids2 = {f.pid for f in loader._pool._processes.values()}
    assert pids1 == pids2  # same worker processes, not respawned
    assert len(batches1) == len(batches2) == 2
    loader.close()
    assert loader._pool is None


def _png_pairs(tmp_path, rng, n=8):
    import cv2

    paths = []
    for i in range(n):
        img = rng.integers(0, 255, (8, 8, 3), dtype=np.uint8)
        p = str(tmp_path / f"g{i}.png")
        cv2.imwrite(p, img)
        paths.append((p, p))
    return paths


def test_grain_loader_batches_and_determinism(tmp_path, rng):
    """Grain-backed loader: same contract as PairLoader; epoch order is a
    pure function of (seed, epoch) — identical across loader instances."""
    from witw_tpu.data.grain_loader import GrainPairLoader

    pairs = _png_pairs(tmp_path, rng)
    mk = lambda: GrainPairLoader(
        pairs, batch_size=4, surface_hw=(8, 8), overhead_hw=(8, 8),
        shuffle=True, seed=7,
    )
    l1, l2 = mk(), mk()
    b1 = list(l1)
    b2 = list(l2)
    assert len(b1) == len(b2) == 2
    for a, b in zip(b1, b2):
        np.testing.assert_array_equal(a["idx"], b["idx"])
        np.testing.assert_array_equal(a["surface"], b["surface"])
        assert a["surface"].shape == (4, 8, 8, 3)
    # second epoch reshuffles
    e2 = list(l1)
    assert not all(
        np.array_equal(a["idx"], b["idx"]) for a, b in zip(b1, e2)
    )


def test_grain_loader_sharding_partitions(tmp_path, rng):
    """Host shards partition the epoch: disjoint, and their union covers
    every sample (multi-host contract)."""
    from witw_tpu.data.grain_loader import GrainPairLoader

    pairs = _png_pairs(tmp_path, rng)
    seen = []
    for shard in range(2):
        loader = GrainPairLoader(
            pairs, batch_size=2, surface_hw=(8, 8), overhead_hw=(8, 8),
            shuffle=True, seed=3, shard_index=shard, shard_count=2,
        )
        seen.append(np.concatenate([b["idx"] for b in loader]))
    assert set(seen[0]).isdisjoint(seen[1])
    assert set(seen[0]) | set(seen[1]) == set(range(8))


def test_loader_recovers_from_broken_pool(tmp_path, rng):
    """A dead worker (segfault/OOM-kill) breaks the ProcessPoolExecutor
    permanently; the loader must drop it so the NEXT epoch gets a fresh pool
    instead of failing forever (review finding, round 2)."""
    from concurrent import futures

    from witw_tpu.data.loader import PairLoader

    paths = _png_pairs(tmp_path, rng, n=4)
    loader = PairLoader(
        paths, batch_size=2, surface_hw=(8, 8), overhead_hw=(8, 8),
        num_workers=2, worker_mode="process",
    )
    list(loader)  # healthy epoch creates the pool
    good_pool = loader._pool
    assert good_pool is not None

    class _Broken:
        def map(self, *a, **k):
            raise futures.process.BrokenProcessPool("worker died")

        def shutdown(self, *a, **k):
            pass

    loader._pool = _Broken()
    with pytest.raises(futures.BrokenExecutor):
        list(loader)
    assert loader._pool is None  # broken pool dropped
    batches = list(loader)  # next epoch recreates and works
    assert len(batches) == 2
    assert loader._pool is not good_pool
    loader.close()


def test_native_lib_refuses_stale_binary(monkeypatch):
    """After a source edit, a failed rebuild must raise instead of silently
    loading the stale .so (review finding, round 2)."""
    import witw_tpu.tools.geotiff as gt

    if gt.native_lib() is None:
        pytest.skip("native lib unavailable")
    monkeypatch.setattr(gt, "_lib", None)
    monkeypatch.setattr(gt, "_lib_is_stale", lambda: True)
    monkeypatch.setattr(gt, "_build_native", lambda: False)
    with pytest.raises(RuntimeError, match="stale"):
        gt.native_lib()
    monkeypatch.setattr(gt, "_lib_is_stale", lambda: False)
    assert gt.native_lib() is not None  # fresh binary still loads


def test_prefetch_iter_propagates_and_orders():
    """The generic producer-thread prefetch (data/loader.prefetch_iter,
    heatmap.sweep's extraction/embed overlap): preserves order, depth=0 is
    the identity/serial path, and a producer exception propagates to the
    consumer instead of deadlocking the queue."""
    from witw_tpu.data.loader import prefetch_iter

    assert list(prefetch_iter(iter(range(20)), depth=2)) == list(range(20))
    it = iter(range(5))
    assert prefetch_iter(it, depth=0) is it  # serial passthrough

    def boom():
        yield 1
        yield 2
        raise RuntimeError("producer failed")

    out = []
    with pytest.raises(RuntimeError, match="producer failed"):
        for x in prefetch_iter(boom(), depth=2):
            out.append(x)
    assert out == [1, 2]

    # abandoning the consumer mid-stream must not deadlock the producer
    gen = prefetch_iter(iter(range(1000)), depth=2)
    assert next(gen) == 0
    gen.close()
