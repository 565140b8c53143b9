"""Data-parallel correctness: a batch-sharded train step over the 8-device
CPU mesh must produce the same parameters as the single-device step (GSPMD
inserts the gradient psum; SURVEY.md §2.4's DP design)."""

import numpy as np
import jax
import pytest

from witw_tpu.parallel import make_mesh, shard_batch, global_batch_from_local
from witw_tpu.train import make_pipeline
from tests.test_train import tiny_fov_cfg, tiny_loader


def test_dp_train_step_matches_single_device(tmp_path):
    cfg = tiny_fov_cfg(tmp_path)
    pipeline = make_pipeline(cfg)
    rng = jax.random.PRNGKey(0)
    state_single = pipeline.init(rng)
    state_sharded = pipeline.init(rng)

    mesh = make_mesh(n_data=8)
    from jax.sharding import NamedSharding, PartitionSpec as P

    state_sharded = jax.device_put(state_sharded, NamedSharding(mesh, P()))

    loader = tiny_loader(n=8, batch=8)
    batch = next(iter(loader))
    data = {k: np.asarray(batch[k], np.float32) for k in ("surface", "overhead")}

    step_rng = jax.random.PRNGKey(7)
    s1, m1 = pipeline.train_step(state_single, dict(data), step_rng)
    s2, m2 = pipeline.train_step(state_sharded, shard_batch(dict(data), mesh), step_rng)

    assert np.allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    p1 = jax.tree.map(np.asarray, s1.params)
    p2 = jax.tree.map(np.asarray, s2.params)
    flat1 = jax.tree.leaves(p1)
    flat2 = jax.tree.leaves(p2)
    # Adam bounds each element's update by ~lr; reduction-order noise in the
    # sharded gradient psum can flip near-zero gradients, so elementwise
    # differences up to ~2*lr are legitimate float noise, not a DP bug.
    lr = cfg.train.optim.learning_rate
    for a, b in zip(flat1, flat2):
        np.testing.assert_allclose(a, b, rtol=1e-3, atol=2.5 * lr)


def test_global_batch_from_local_single_process(tmp_path):
    mesh = make_mesh(n_data=8)
    batch = {"surface": np.zeros((8, 4, 4, 3), np.float32)}
    out = global_batch_from_local(batch, mesh)
    assert out["surface"].shape == (8, 4, 4, 3)
    # batch axis sharded over the 8 devices
    assert len(out["surface"].sharding.device_set) == 8


def _planted_pairs(rng, n, h, w, sw, c):
    """Gallery/query pairs with decisive structure: each query is an exact
    window of its gallery item, so correlation peaks and rank comparisons are
    far from any roundoff tie (random data makes argmax/rank flip under
    1-ulp differences from different lowering contexts — NOTES.md landmine)."""
    o = rng.standard_normal((n, h, w, c)).astype(np.float32)
    shifts = rng.integers(0, w, size=n)
    s = np.stack([o[i][:, (shifts[i] + np.arange(sw)) % w, :] for i in range(n)])
    return o, s.astype(np.float32)


def test_gallery_sharded_eval_bitmatches_single_device(rng):
    """SURVEY.md §5.7: gallery-resident sharded sweep. The gallery tensors are
    physically sharded over all 8 devices and the psum'd rank counts are
    bitwise identical to the single-device evaluator."""
    from witw_tpu.evaluation.gallery import FovGalleryEvaluator

    n = 41  # not divisible by devices*chunk -> exercises padding
    o_emb, s_emb = _planted_pairs(rng, n, h=2, w=16, sw=8, c=3)

    single = FovGalleryEvaluator(query_block=16, gallery_chunk=4)
    ranks_single = single.ranks(o_emb, s_emb)

    mesh = make_mesh(n_data=4, n_gallery=2)
    sharded = FovGalleryEvaluator(
        mesh=mesh, query_block=16, gallery_chunk=4, shard_gallery=True
    )
    ranks_sharded = sharded.ranks(o_emb, s_emb)

    np.testing.assert_array_equal(ranks_sharded, ranks_single)
    # the gallery was resident-sharded over every device of the mesh
    assert len(sharded.last_gallery_sharding.device_set) == 8
    spec = sharded.last_gallery_sharding.spec
    assert spec[0] == ("data", "gallery") or spec[0] == ("data",) or tuple(spec[0]) == ("data", "gallery")


def test_gallery_sharded_eval_full_width_queries(rng):
    """sw == w path (fov=360) through the sharded sweep."""
    from witw_tpu.evaluation.gallery import FovGalleryEvaluator

    n = 24
    o_emb, s_emb = _planted_pairs(rng, n, h=1, w=16, sw=16, c=2)
    single = FovGalleryEvaluator(query_block=8, gallery_chunk=2)
    mesh = make_mesh(n_data=8)
    sharded = FovGalleryEvaluator(
        mesh=mesh, query_block=8, gallery_chunk=2, shard_gallery=True
    )
    np.testing.assert_array_equal(
        sharded.ranks(o_emb, s_emb), single.ranks(o_emb, s_emb)
    )
