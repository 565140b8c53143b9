"""Gallery evaluation vs brute force, single-device and sharded."""

import numpy as np
import jax
import jax.numpy as jnp

from witw_tpu.evaluation import FovGalleryEvaluator, euclidean_ranks, metrics_from_ranks
from witw_tpu.match import circular_correlation, chord_distance
from witw_tpu.parallel import make_mesh


def brute_force_fov_ranks(o, s):
    """Per-query loop like the reference (cvig_fov.py:544-552), built on the
    (already oracle-tested) full-matrix ops."""
    n = o.shape[0]
    corr = circular_correlation(jnp.asarray(o), jnp.asarray(s))
    d, _ = chord_distance(jnp.asarray(o), jnp.asarray(s), corr)
    d = np.asarray(d)  # [gallery, query]
    ranks = np.zeros(n, dtype=int)
    for q in range(n):
        ranks[q] = np.sum(d[:, q] <= d[q, q])
    return ranks


def _random_embeds(rng, n, h=2, w=8, sw=5, c=3):
    o = rng.standard_normal((n, h, w, c)).astype(np.float32)
    s = rng.standard_normal((n, h, sw, c)).astype(np.float32)
    # Plant correlation so ranks aren't all-ties: each surface is a noisy
    # window of its overhead map.
    for i in range(n):
        start = rng.integers(0, w)
        cols = [(start + k) % w for k in range(sw)]
        s[i] = o[i][:, cols, :] + 0.1 * s[i]
    return o, s


def test_fov_evaluator_matches_bruteforce(rng):
    o, s = _random_embeds(rng, 20)
    ev = FovGalleryEvaluator(query_block=8, gallery_chunk=8)
    got = ev.ranks(o, s)
    want = brute_force_fov_ranks(o, s)
    np.testing.assert_array_equal(got, want)


def test_fov_evaluator_fast_matmul_rank_agreement(rng):
    """The bf16 fast-matmul sweep (opt-in approximation; the exact complex
    einsum stays the parity default) reproduces exact ranks on
    planted-structure data — same acceptance contract as the int8 serving
    path. Margins here are far above bf16 rounding; only near-exact ties
    could flip, which planted structure avoids."""
    o, s = _random_embeds(rng, 64, h=4, w=16, sw=10, c=8)
    want = FovGalleryEvaluator(query_block=16, gallery_chunk=16).ranks(o, s)
    got = FovGalleryEvaluator(
        query_block=16, gallery_chunk=16, fast_matmul=True
    ).ranks(o, s)
    np.testing.assert_array_equal(got, want)


def test_index_fast_matmul_agreement(rng):
    """GalleryIndex's three retrieval forms under fast=True (bf16 frequency
    product) preserve what the approximation contract promises on
    planted-structure data: the PLANTED top-1 identity (clear margin), and
    distances within bf16 rounding everywhere. Tail-of-top-k identities among
    noise items are near-ties and may legitimately reorder — same contract as
    the evaluator's rank-agreement test and the int8 serving path."""
    from witw_tpu.evaluation import GalleryIndex

    o, s = _random_embeds(rng, 48, h=2, w=16, sw=10, c=4)
    idx = GalleryIndex(o)
    true_top1 = np.arange(48)

    i_e, d_e, _ = idx.search(s, k=3, gallery_chunk=16)
    i_f, d_f, _ = idx.search(s, k=3, gallery_chunk=16, fast=True)
    np.testing.assert_array_equal(i_e[:, 0], true_top1)
    np.testing.assert_array_equal(i_f[:, 0], true_top1)
    # both are ascending-sorted; near-tie membership swaps keep them close
    np.testing.assert_allclose(d_f, d_e, atol=8e-2)

    de, oe = idx.score_all(s, gallery_chunk=16)
    df, of = idx.score_all(s, gallery_chunk=16, fast=True)
    np.testing.assert_allclose(df, de, atol=8e-2)
    # orientation argmax of the PLANTED pair is margin-protected; noise
    # pairs' argmax can flip between near-tie shifts
    np.testing.assert_array_equal(
        of[true_top1, true_top1], oe[true_top1, true_top1]
    )

    ia_e, da_e, _ = idx.search_approx(s, k=3, candidates=12)
    ia_f, da_f, _ = idx.search_approx(s, k=3, candidates=12, fast=True)
    np.testing.assert_array_equal(ia_e[:, 0], true_top1)
    np.testing.assert_array_equal(ia_f[:, 0], true_top1)
    np.testing.assert_allclose(da_f, da_e, atol=8e-2)


def test_fov_evaluator_asymmetric_gallery(rng):
    """Q != G with explicit true-match indices (VERDICT r2 weak #8): ranks
    against an enlarged gallery match a brute-force loop, in both the plain
    and the gallery-resident sharded form."""
    n_q, n_extra = 12, 20
    o_full, s = _random_embeds(rng, n_q)
    # enlarge the gallery with distractors; shuffle so true matches land at
    # arbitrary indices
    distract = rng.standard_normal(
        (n_extra, *o_full.shape[1:])).astype(np.float32)
    gal = np.concatenate([o_full, distract])
    perm = rng.permutation(len(gal))
    gal = gal[perm]
    true_match = np.argsort(perm)[:n_q]  # position of item i after the perm

    corr = circular_correlation(jnp.asarray(gal), jnp.asarray(s))
    d, _ = chord_distance(jnp.asarray(gal), jnp.asarray(s), corr)
    d = np.asarray(d)  # [G, Q]
    want = np.array([
        np.sum(d[:, q] <= d[true_match[q], q]) for q in range(n_q)
    ])

    ev = FovGalleryEvaluator(query_block=8, gallery_chunk=8)
    got = ev.ranks(gal, s, true_match=true_match)
    np.testing.assert_array_equal(got, want)

    mesh = make_mesh(n_data=8)
    ev_g = FovGalleryEvaluator(
        mesh=mesh, query_block=8, gallery_chunk=2, shard_gallery=True)
    got_g = ev_g.ranks(gal, s, true_match=true_match)
    np.testing.assert_array_equal(got_g, want)

    # without indices, asymmetric sizes must be rejected
    import pytest as _pytest
    with _pytest.raises(AssertionError):
        ev.ranks(gal, s)


def test_fov_evaluator_true_rank_above_one(rng):
    """True rank > 1 must be exact in every sweep variant. The self pair's
    sweep distance and its d_true threshold come from differently-batched
    kernels whose f32 accumulation differs (~1e-7, measured) — the evaluator
    must count the true match unconditionally (reference semantics: the self
    tie is exact within one distance matrix, cvig_fov.py:552), not clamp
    counts to >= 1 (which only repairs rank-1 queries)."""
    n, h, w, sw, c = 24, 4, 16, 10, 8
    o = rng.standard_normal((n, h, w, c)).astype(np.float32)
    s = np.zeros((n, h, sw, c), np.float32)
    for q in range(n):
        j = (q + 1) % n
        cols = [(k) % w for k in range(sw)]
        # best match is gallery item j, the TRUE match (self) is second by a
        # clear margin, everything else is uncorrelated noise
        s[q] = o[j][:, cols, :] + 0.3 * o[q][:, cols, :]
    want = brute_force_fov_ranks(o, s)
    assert np.all(want == 2), want  # planted structure sanity
    for kwargs in (
        {},
        {"fast_matmul": True},
        {"mesh": make_mesh(n_data=8)},
        {"mesh": make_mesh(n_data=8), "shard_gallery": True},
    ):
        ev = FovGalleryEvaluator(query_block=8, gallery_chunk=8, **kwargs)
        np.testing.assert_array_equal(ev.ranks(o, s), want, err_msg=str(kwargs))


def test_fov_evaluator_sharded_matches_single(rng):
    o, s = _random_embeds(rng, 32)
    single = FovGalleryEvaluator(query_block=16, gallery_chunk=16).ranks(o, s)
    mesh = make_mesh(n_data=8)
    sharded = FovGalleryEvaluator(mesh=mesh, query_block=16, gallery_chunk=16).ranks(o, s)
    np.testing.assert_array_equal(single, sharded)


def test_euclidean_ranks_bruteforce(rng):
    n, dim = 30, 16
    g = rng.standard_normal((n, dim)).astype(np.float32)
    q = g + 0.1 * rng.standard_normal((n, dim)).astype(np.float32)
    got = euclidean_ranks(g, q, block=7)
    want = np.zeros(n, dtype=int)
    for i in range(n):
        d = np.sqrt(np.sum((g - q[i]) ** 2, axis=1))
        want[i] = np.sum(d <= d[i])
    np.testing.assert_array_equal(got, want)


def test_euclidean_ranks_asymmetric_and_sharded(rng):
    """Baseline-family eval at FOV-evaluator capability (VERDICT r3 #5):
    Q != G with explicit true-match indices, and the gallery-resident
    mesh-sharded sweep — both against a brute-force loop, with sharded ==
    unsharded bitwise."""
    import pytest as _pytest

    n_q, n_extra, dim = 24, 43, 16  # 67 gallery rows: pads the 8-way split
    g_true = rng.standard_normal((n_q, dim)).astype(np.float32)
    q = g_true + 0.1 * rng.standard_normal((n_q, dim)).astype(np.float32)
    distract = rng.standard_normal((n_extra, dim)).astype(np.float32)
    gal = np.concatenate([g_true, distract])
    perm = rng.permutation(len(gal))
    gal = gal[perm]
    true_match = np.argsort(perm)[:n_q]

    want = np.zeros(n_q, dtype=int)
    for i in range(n_q):
        d = np.sum((gal - q[i]) ** 2, axis=1)
        want[i] = np.sum(d <= d[true_match[i]])

    got = euclidean_ranks(gal, q, block=7, true_match=true_match)
    np.testing.assert_array_equal(got, want)

    mesh = make_mesh(n_data=8)
    got_sh = euclidean_ranks(gal, q, block=7, true_match=true_match, mesh=mesh)
    np.testing.assert_array_equal(got_sh, got)

    # symmetric case: sharded == unsharded == brute force
    got_sym = euclidean_ranks(g_true, q, block=7)
    got_sym_sh = euclidean_ranks(g_true, q, block=7, mesh=mesh)
    np.testing.assert_array_equal(got_sym_sh, got_sym)

    # without indices, asymmetric sizes must be rejected
    with _pytest.raises(AssertionError):
        euclidean_ranks(gal, q)


def test_metrics_from_ranks():
    ranks = np.array([1, 1, 2, 7, 50, 200])
    m = metrics_from_ranks(ranks)
    assert m["top_1"] == 2 / 6 * 100
    assert m["top_5"] == 3 / 6 * 100
    assert m["top_10"] == 4 / 6 * 100
    assert m["locations"] == 6
    assert m["avg_rank"] == np.mean(ranks)
    assert m["med_rank"] == np.median(ranks)


def test_gallery_index_topk_and_persistence(rng, tmp_path):
    """GalleryIndex.search returns the exact blockwise top-k (vs full-matrix
    argsort) and survives a save/load roundtrip."""
    from witw_tpu.evaluation import GalleryIndex

    o, s = _random_embeds(rng, 40)
    idx = GalleryIndex(o, meta={"x": np.arange(40.0), "y": np.arange(40.0) * 2})
    indices, dists, orients = idx.search(s, k=5, gallery_chunk=16)
    assert indices.shape == (40, 5)

    corr = circular_correlation(jnp.asarray(o), jnp.asarray(s))
    d, orient_full = chord_distance(jnp.asarray(o), jnp.asarray(s), corr)
    d = np.asarray(d)  # [G, Q]
    for q in range(40):
        want = np.argsort(d[:, q], kind="stable")[:5]
        np.testing.assert_allclose(np.sort(dists[q]), np.sort(d[want, q]), rtol=1e-5, atol=1e-6)
    # planted structure: the true match should dominate top-1 often
    top1_hits = np.mean(indices[:, 0] == np.arange(40))
    assert top1_hits > 0.8

    path = str(tmp_path / "index.npz")
    idx.save(path)
    idx2 = GalleryIndex.load(path)
    np.testing.assert_array_equal(idx2.embeds, idx.embeds)
    np.testing.assert_array_equal(idx2.meta["y"], idx.meta["y"])
    i2, d2, _ = idx2.search(s, k=5, gallery_chunk=64)
    np.testing.assert_allclose(d2, dists, rtol=1e-5, atol=1e-6)


def test_index_score_all_matches_search_at_50k_scale(rng):
    """score_all (the heatmap sweep engine) computes every gallery item's
    distance chunkwise in bounded device memory; at 50k gallery items its
    distances/orientations agree with the chunked top-k search for the top
    matches and with a dense computation on a slice."""
    from witw_tpu.evaluation.index import GalleryIndex

    n, h, w, c = 50_000, 1, 8, 2
    gal = rng.standard_normal((n, h, w, c)).astype(np.float32)
    q = rng.standard_normal((1, h, 4, c)).astype(np.float32)
    index = GalleryIndex(gal)

    d_all, o_all = index.score_all(q, gallery_chunk=4096)
    assert d_all.shape == (n, 1) and o_all.shape == (n, 1)
    assert np.all(np.isfinite(d_all))

    idx, d_top, o_top = index.search(q, k=10, gallery_chunk=4096)
    np.testing.assert_allclose(d_all[idx[0], 0], d_top[0], rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(o_all[idx[0], 0], o_top[0])
    # dense oracle on a slice
    from witw_tpu.match.correlation import circular_correlation
    from witw_tpu.match.distance import chord_distance

    sl = slice(1000, 1032)
    corr = circular_correlation(jnp.asarray(gal[sl]), jnp.asarray(q))
    d_dense, o_dense = chord_distance(jnp.asarray(gal[sl]), jnp.asarray(q), corr)
    np.testing.assert_allclose(d_all[sl], np.asarray(d_dense), rtol=1e-4, atol=1e-5)


def test_index_score_all_resident_matches_streaming(rng):
    """score_all's device-resident mode (gallery FFT cached across calls —
    the repeated-sweep serving path; 78-186 s -> 3.5 s warm per call over a
    100k index through the axon tunnel) returns the same distances and
    planted-pair orientations as the host-streaming mode, including at a
    padded remainder chunk, and reuses search()'s cached tables."""
    from witw_tpu.evaluation import GalleryIndex

    o, s = _random_embeds(rng, 50, h=2, w=16, sw=10, c=4)
    idx = GalleryIndex(o)
    # 50 items over chunk 16 -> a remainder chunk padded to the fixed shape
    d_res, o_res = idx.score_all(s, gallery_chunk=16, resident=True)
    assert idx._fo is not None  # the shared table search() also uses
    d_str, o_str = idx.score_all(s, gallery_chunk=16, resident=False)
    np.testing.assert_allclose(d_res, d_str, rtol=1e-5, atol=1e-6)
    planted = np.arange(50)
    np.testing.assert_array_equal(
        o_res[planted, planted], o_str[planted, planted]
    )
    # second resident call reuses the cached FFT (no rebuild)
    fo_before = idx._fo
    d_res2, _ = idx.score_all(s, gallery_chunk=16, resident=True)
    assert idx._fo is fo_before
    np.testing.assert_array_equal(d_res2, d_res)
    # auto mode: a tiny gallery picks resident; a fake huge footprint streams
    assert idx._resident_bytes() <= GalleryIndex.RESIDENT_BYTES_MAX


def test_index_search_approx_two_stage(rng):
    """search_approx: with candidates >= N it reproduces the exact search;
    with a small candidate pool on planted-structure data the pooled-cosine
    prefilter (width-mean is orientation-invariant) preserves the top-1
    matches found by the exact sweep."""
    from witw_tpu.evaluation import GalleryIndex

    o, s = _random_embeds(rng, 48)
    idx = GalleryIndex(o)

    ie, de, oe = idx.search(s, k=5, gallery_chunk=16)
    ia, da, oa = idx.search_approx(s, k=5, candidates=48, query_block=13)
    np.testing.assert_allclose(da, de, rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(ia, ie)
    np.testing.assert_array_equal(oa, oe)

    ia2, da2, _ = idx.search_approx(s, k=5, candidates=8, query_block=16)
    # the exact top-1 survives the 6x-smaller candidate pool on planted data
    assert np.mean(ia2[:, 0] == ie[:, 0]) > 0.9
    # reranked distances are exact for whatever candidates were selected
    assert np.all(da2[:, 0] >= de[:, 0] - 1e-6)


def test_index_search_approx_narrow_fov(rng):
    """Prefilter recall gate at a serving-like FOV fraction (sw/w ~ 0.19,
    the daemon's FOV-70 regime) and production-like descriptor dims: the
    shifted-window prefilter must keep the exact top-1 in a ~3%-of-gallery
    candidate pool (the full-width-mean descriptor measured ~0.85 here —
    ADVICE r2)."""
    from witw_tpu.evaluation import GalleryIndex

    n, h, w, sw, c = 512, 4, 64, 12, 16
    o = rng.standard_normal((n, h, w, c)).astype(np.float32)
    s = rng.standard_normal((n, h, sw, c)).astype(np.float32)
    for i in range(n):
        start = rng.integers(0, w)
        cols = [(start + k) % w for k in range(sw)]
        s[i] = o[i][:, cols, :] + 0.1 * s[i]
    idx = GalleryIndex(o)

    ie, de, _ = idx.search(s, k=5, gallery_chunk=128)
    ia, da, _ = idx.search_approx(s, k=5, candidates=16, query_block=64)
    assert np.mean(ia[:, 0] == ie[:, 0]) > 0.97
    # full-width queries still take the single-descriptor (S=1) path
    assert idx._pooled(w).shape[1] == 1
    assert idx._pooled(sw).shape[1] == int(np.ceil(w / (sw // 2)))


def test_index_search_sharded_matches_single(rng):
    """Mesh-resident sharded top-k: distances/indices/orientations match the
    single-device chunked search exactly, the gallery is physically sharded
    over all 8 mesh devices, and sizes that don't divide the mesh (padding)
    are handled."""
    from witw_tpu.evaluation import GalleryIndex

    for n in (40, 37):  # 37: pads both the device split and the chunk split
        o, s = _random_embeds(rng, n)
        idx = GalleryIndex(o)
        ie, de, oe = idx.search(s, k=5, gallery_chunk=16)

        mesh = make_mesh(n_data=8)
        idx.place_sharded(mesh, gallery_chunk=4, max_k=8)
        # proof of residency: the gallery axis is split over all 8 devices
        assert len(idx.last_gallery_sharding.device_set) == 8
        n_pad = idx._sharded["gal"].shape[0]
        assert all(
            sh.data.shape[0] == n_pad // 8
            for sh in idx._sharded["gal"].addressable_shards
        )
        i_s, d_s, o_s = idx.search_sharded(s, k=5)
        np.testing.assert_allclose(d_s, de, rtol=1e-5, atol=1e-6)
        # planted structure separates scores, so index order is deterministic
        np.testing.assert_array_equal(i_s, ie)
        np.testing.assert_array_equal(o_s, oe)

        # k > max_k must be rejected, not silently truncated
        import pytest as _pytest
        with _pytest.raises(ValueError):
            idx.search_sharded(s, k=9)

    # lazy placement via mesh= kwarg
    o, s = _random_embeds(rng, 24)
    idx2 = GalleryIndex(o)
    i_l, d_l, _ = idx2.search_sharded(s, k=3, mesh=make_mesh(n_data=8))
    i_e, d_e, _ = idx2.search(s, k=3)
    np.testing.assert_allclose(d_l, d_e, rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(i_l, i_e)


def test_index_score_all_sharded_matches_single(rng):
    """score_all_sharded (multi-chip heatmap scoring) returns the same
    [N, Q] distances/orientations as the single-device chunked score_all,
    including at sizes that pad the device and chunk splits."""
    from witw_tpu.evaluation import GalleryIndex

    for n in (32, 27):
        o, s = _random_embeds(rng, n)
        idx = GalleryIndex(o)
        d1, o1 = idx.score_all(s, gallery_chunk=8)
        mesh = make_mesh(n_data=8)
        d2, o2 = idx.score_all_sharded(s, mesh=mesh, gallery_chunk=4)
        assert d2.shape == (n, n) and o2.shape == (n, n)
        np.testing.assert_allclose(d2, d1, rtol=1e-5, atol=1e-6)
        np.testing.assert_array_equal(o2, o1)


# ---------------------------------------------------------------------------
# VectorIndex — the SAFA/baseline families' flat-vector serving index
# ---------------------------------------------------------------------------


def _random_vectors(rng, n, d=24, q=None):
    """Planted-structure unit vectors: query i is a noisy copy of gallery
    item i, so top-1 is unambiguous and ranks aren't tie-sensitive."""
    g = rng.standard_normal((n, d)).astype(np.float32)
    g /= np.linalg.norm(g, axis=1, keepdims=True)
    qn = n if q is None else q
    s = g[:qn] + 0.05 * rng.standard_normal((qn, d)).astype(np.float32)
    s /= np.linalg.norm(s, axis=1, keepdims=True)
    return g, s


def _brute_vector_topk(g, s, k):
    d = np.sqrt(np.maximum(
        np.sum(s * s, 1)[:, None] + np.sum(g * g, 1)[None, :]
        - 2.0 * s @ g.T, 0.0))
    idx = np.argsort(d, axis=1)[:, :k]
    rows = np.arange(s.shape[0])[:, None]
    return idx, d[rows, idx], d


def test_vector_index_search_matches_bruteforce(rng):
    """Single-dispatch whole-gallery top-k equals the numpy brute force on
    planted-structure unit vectors."""
    from witw_tpu.evaluation import VectorIndex

    g, s = _random_vectors(rng, 50, d=24, q=20)
    idx = VectorIndex(g)
    i_got, d_got = idx.search(s, k=5)
    i_want, d_want, _ = _brute_vector_topk(g, s, 5)
    np.testing.assert_array_equal(i_got, i_want)
    np.testing.assert_allclose(d_got, d_want, rtol=1e-5, atol=1e-6)


def test_vector_index_score_all_modes_match(rng):
    """score_all resident and streaming modes agree with each other and with
    the brute-force distance matrix, including at a padded remainder."""
    from witw_tpu.evaluation import VectorIndex

    g, s = _random_vectors(rng, 37, d=16, q=9)
    idx = VectorIndex(g)
    d_res = idx.score_all(s, gallery_chunk=16, resident=True)
    d_str = idx.score_all(s, gallery_chunk=16, resident=False)
    _, _, d_want = _brute_vector_topk(g, s, 1)
    np.testing.assert_allclose(d_res, d_want.T, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(d_str, d_want.T, rtol=1e-5, atol=1e-6)
    # resident mode cached the device gallery across calls
    gal_before = idx._gal
    assert gal_before is not None
    idx.score_all(s, gallery_chunk=16, resident=True)
    assert idx._gal is gal_before


def test_vector_index_save_load_and_type_guard(rng, tmp_path):
    """npz round trip preserves embeds + meta; loading an FOV-family
    GalleryIndex file through VectorIndex fails loudly, not silently."""
    from witw_tpu.evaluation import GalleryIndex, VectorIndex

    g, _ = _random_vectors(rng, 12, d=8)
    meta = {"x": np.arange(12.0), "precision": "f32", "params_sha": "abc"}
    idx = VectorIndex(g, meta=meta)
    p = str(tmp_path / "vec_idx")
    idx.save(p)
    loaded = VectorIndex.load(p)
    np.testing.assert_array_equal(loaded.embeds, idx.embeds)
    assert str(loaded.meta["precision"]) == "f32"
    np.testing.assert_array_equal(loaded.meta["x"], meta["x"])

    o, _ = _random_embeds(rng, 6)
    GalleryIndex(o).save(str(tmp_path / "fft_idx"))
    import pytest as _pytest
    with _pytest.raises(ValueError, match="GalleryIndex"):
        VectorIndex.load(str(tmp_path / "fft_idx"))
    with _pytest.raises(AssertionError, match="GalleryIndex"):
        VectorIndex(o)


def test_vector_index_sharded_matches_single(rng):
    """search_sharded / score_all_sharded on an 8-device mesh equal the
    single-device paths, including when N pads the device and chunk splits
    and when k exceeds one shard's item count."""
    from witw_tpu.evaluation import VectorIndex

    for n in (32, 27):
        g, s = _random_vectors(rng, n, d=16, q=10)
        idx = VectorIndex(g)
        mesh = make_mesh(n_data=8)
        idx.place_sharded(mesh, gallery_chunk=4, max_k=8)
        assert len(idx.last_gallery_sharding.device_set) == 8
        i_sh, d_sh = idx.search_sharded(s, k=5)
        i_e, d_e = idx.search(s, k=5)
        np.testing.assert_array_equal(i_sh, i_e)
        np.testing.assert_allclose(d_sh, d_e, rtol=1e-5, atol=1e-6)

        d_all_sh = idx.score_all_sharded(s)
        d_all = idx.score_all(s, gallery_chunk=8)
        np.testing.assert_allclose(d_all_sh, d_all, rtol=1e-5, atol=1e-6)

        import pytest as _pytest
        with _pytest.raises(ValueError):
            idx.search_sharded(s, k=9)

    # lazy placement via mesh= kwarg
    g, s = _random_vectors(rng, 24, d=16)
    idx2 = VectorIndex(g)
    i_l, d_l = idx2.search_sharded(s, k=3, mesh=make_mesh(n_data=8))
    i_e, d_e = idx2.search(s, k=3)
    np.testing.assert_array_equal(i_l, i_e)
    np.testing.assert_allclose(d_l, d_e, rtol=1e-5, atol=1e-6)
