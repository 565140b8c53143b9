"""Pallas fused correlation+distance kernel vs the XLA reference path.

Runs in interpreter mode on CPU (tests); the compiled kernel runs on real TPU
(exercised by bench/eval on hardware).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from witw_tpu.match import chord_distance, circular_correlation
from witw_tpu.ops.pallas.fused_match import fused_chord_distance_nhwc


@pytest.mark.parametrize("sw", [8, 5])
def test_fused_matches_xla_path(rng, sw):
    g, q, h, w, c = 8, 4, 2, 8, 3
    o = rng.standard_normal((g, h, w, c)).astype(np.float32)
    s = rng.standard_normal((q, h, sw, c)).astype(np.float32)
    corr = circular_correlation(jnp.asarray(o), jnp.asarray(s))
    want_d, want_or = chord_distance(jnp.asarray(o), jnp.asarray(s), corr)
    got_d, got_or = fused_chord_distance_nhwc(
        jnp.asarray(o), jnp.asarray(s), g_blk=4, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(got_or), np.asarray(want_or))
    np.testing.assert_allclose(np.asarray(got_d), np.asarray(want_d), rtol=1e-5, atol=1e-6)


def test_fused_pads_gallery(rng):
    # G not divisible by g_blk exercises the padding path.
    g, q, h, w, c, sw = 6, 3, 1, 8, 4, 5
    o = rng.standard_normal((g, h, w, c)).astype(np.float32)
    s = rng.standard_normal((q, h, sw, c)).astype(np.float32)
    corr = circular_correlation(jnp.asarray(o), jnp.asarray(s))
    want_d, _ = chord_distance(jnp.asarray(o), jnp.asarray(s), corr)
    got_d, _ = fused_chord_distance_nhwc(jnp.asarray(o), jnp.asarray(s), g_blk=4, interpret=True)
    np.testing.assert_allclose(np.asarray(got_d), np.asarray(want_d), rtol=1e-5, atol=1e-6)


def test_evaluator_pallas_path_matches(rng):
    """FovGalleryEvaluator(use_pallas=True) produces the same ranks as the
    FFT path on tie-free (planted-structure) data. The Pallas kernel falls
    back to interpret mode automatically on the CPU backend."""
    from witw_tpu.evaluation import FovGalleryEvaluator

    n, h, w, c, sw = 16, 2, 8, 3, 5
    o = rng.standard_normal((n, h, w, c)).astype(np.float32)
    s = rng.standard_normal((n, h, sw, c)).astype(np.float32)
    # Plant each surface as a noisy window of its overhead map so distances
    # are well-separated (no float near-ties between the two backends).
    for i in range(n):
        start = rng.integers(0, w)
        cols = [(start + k) % w for k in range(sw)]
        s[i] = o[i][:, cols, :] + 0.1 * s[i]
    want = FovGalleryEvaluator(query_block=8, gallery_chunk=8).ranks(o, s)
    got = FovGalleryEvaluator(query_block=8, gallery_chunk=8, use_pallas=True).ranks(o, s)
    np.testing.assert_array_equal(got, want)
