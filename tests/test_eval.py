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


def test_metrics_from_ranks():
    ranks = np.array([1, 1, 2, 7, 50, 200])
    m = metrics_from_ranks(ranks)
    assert m["top_1"] == 2 / 6 * 100
    assert m["top_5"] == 3 / 6 * 100
    assert m["top_10"] == 4 / 6 * 100
    assert m["locations"] == 6
    assert m["avg_rank"] == np.mean(ranks)
    assert m["med_rank"] == np.median(ranks)
