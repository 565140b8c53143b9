"""Matching ops vs brute-force NumPy oracles.

Oracle semantics follow the reference's definitions (model/cvig_fov.py:297-382)
computed independently here with explicit loops.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from witw_tpu.match import (
    circular_correlation,
    orientation_estimate,
    chord_distance,
    paired_chord_distance,
    window_sq_norms,
    crop_overhead_materialized,
    chord_distance_materialized,
    dsm_triplet_loss,
    exhaustive_minibatch_triplet_loss,
)


def brute_force_correlation(o, s):
    """corr[a, b, i] = sum_{h,k,c} o[a, h, (i+k)%W, c] * s[b, h, k, c]."""
    bo, h, w, c = o.shape
    bs, _, sw, _ = s.shape
    out = np.zeros((bo, bs, w))
    for a in range(bo):
        for b in range(bs):
            for i in range(w):
                acc = 0.0
                for k in range(sw):
                    acc += np.sum(o[a, :, (i + k) % w, :] * s[b, :, k, :])
                out[a, b, i] = acc
    return out


def brute_force_distance(o, s):
    """Reference chord distance: roll-to-argmax crop, normalize, 2*(1-cos)."""
    corr = brute_force_correlation(o, s)
    orient = np.argmax(corr, axis=-1)
    bo, bs, _ = corr.shape
    _, h, w, c = o.shape
    sw = s.shape[2]
    d = np.zeros((bo, bs))
    for a in range(bo):
        for b in range(bs):
            cols = (np.arange(sw) + orient[a, b]) % w
            crop = o[a][:, cols, :].reshape(-1)
            sv = s[b].reshape(-1)
            cos = np.dot(crop / np.linalg.norm(crop), sv / np.linalg.norm(sv))
            d[a, b] = 2 * (1 - cos)
    return d, orient


@pytest.mark.parametrize("method", ["matmul", "fft"])
@pytest.mark.parametrize("sw", [5, 8])
def test_circular_correlation(rng, method, sw):
    o = rng.standard_normal((3, 2, 8, 4)).astype(np.float32)
    s = rng.standard_normal((2, 2, sw, 4)).astype(np.float32)
    got = np.asarray(circular_correlation(jnp.asarray(o), jnp.asarray(s), method=method))
    want = brute_force_correlation(o, s)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_window_sq_norms(rng):
    o = rng.standard_normal((2, 3, 8, 4)).astype(np.float32)
    sw = 5
    got = np.asarray(window_sq_norms(jnp.asarray(o), sw))
    for b in range(2):
        for i in range(8):
            cols = [(i + k) % 8 for k in range(sw)]
            want = np.sum(o[b][:, cols, :] ** 2)
            np.testing.assert_allclose(got[b, i], want, rtol=1e-5)


@pytest.mark.parametrize("sw", [5, 8])
def test_streaming_distance_matches_bruteforce(rng, sw):
    o = rng.standard_normal((4, 2, 8, 3)).astype(np.float32)
    s = rng.standard_normal((3, 2, sw, 3)).astype(np.float32)
    corr = circular_correlation(jnp.asarray(o), jnp.asarray(s))
    d, orient = chord_distance(jnp.asarray(o), jnp.asarray(s), corr)
    want_d, want_orient = brute_force_distance(o, s)
    np.testing.assert_array_equal(np.asarray(orient), want_orient)
    np.testing.assert_allclose(np.asarray(d), want_d, rtol=1e-4, atol=1e-5)


def test_streaming_matches_materialized(rng):
    o = rng.standard_normal((4, 2, 8, 3)).astype(np.float32)
    s = rng.standard_normal((3, 2, 5, 3)).astype(np.float32)
    corr = circular_correlation(jnp.asarray(o), jnp.asarray(s))
    orient = orientation_estimate(corr)
    cropped = crop_overhead_materialized(jnp.asarray(o), orient, 5)
    d_mat = chord_distance_materialized(cropped, jnp.asarray(s))
    d_stream, _ = chord_distance(jnp.asarray(o), jnp.asarray(s), corr)
    np.testing.assert_allclose(np.asarray(d_stream), np.asarray(d_mat), rtol=1e-4, atol=1e-5)


def test_paired_distance_matches_diagonal(rng):
    o = rng.standard_normal((4, 2, 8, 3)).astype(np.float32)
    s = rng.standard_normal((4, 2, 5, 3)).astype(np.float32)
    corr = circular_correlation(jnp.asarray(o), jnp.asarray(s))
    d_full, orient_full = chord_distance(jnp.asarray(o), jnp.asarray(s), corr)
    d_pair, orient_pair = paired_chord_distance(jnp.asarray(o), jnp.asarray(s))
    np.testing.assert_allclose(
        np.asarray(d_pair), np.diagonal(np.asarray(d_full)), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_array_equal(
        np.asarray(orient_pair), np.diagonal(np.asarray(orient_full))
    )


def test_dsm_triplet_loss_oracle(rng):
    b = 6
    d = rng.uniform(0, 4, size=(b, b)).astype(np.float32)
    alpha = 10.0
    # Oracle: direct transcription of the published loss formula.
    matching = np.diagonal(d)
    total = 0.0
    for i in range(b):
        for j in range(b):
            total += np.log1p(np.exp(alpha * (matching[j] - d[i, j])))
            total += np.log1p(np.exp(alpha * (matching[i] - d[i, j])))
    want = total / (2 * b * (b - 1))
    got = float(dsm_triplet_loss(jnp.asarray(d), alpha=alpha))
    np.testing.assert_allclose(got, want, rtol=1e-5)


@pytest.mark.parametrize("soft", [False, True])
def test_exhaustive_triplet_loss_oracle(rng, soft):
    b, dim = 5, 7
    e1 = rng.standard_normal((b, dim)).astype(np.float32)
    e2 = rng.standard_normal((b, dim)).astype(np.float32)
    alpha, margin = 10.0, 1.0
    # Oracle: the roll-loop formulation.
    total = 0.0
    for (a, p) in [(e1, e2), (e2, e1)]:
        for shift in range(1, b):
            n = np.roll(p, shift, axis=0)
            ap = np.sum((p - a) ** 2, axis=1)
            an = np.sum((n - a) ** 2, axis=1)
            if soft:
                # logaddexp(0, x) == log(1+exp(x)) without float overflow;
                # the implementation uses the equivalent stable softplus
                # (naive log1p(exp(x)) infs past x ~ 88 in float32)
                total += np.sum(np.logaddexp(0.0, alpha * (ap - an)))
            else:
                total += np.sum(np.maximum(ap - an + margin, 0))
    want = total / (2 * b * (b - 1))
    got = float(
        exhaustive_minibatch_triplet_loss(
            jnp.asarray(e1), jnp.asarray(e2), soft_margin=soft, alpha=alpha, margin=margin
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_distance_gradients_flow(rng):
    """Loss gradient wrt both embeddings is finite and nonzero through the
    streaming distance (argmax treated as constant, like the reference)."""
    o = jnp.asarray(rng.standard_normal((4, 2, 8, 3)).astype(np.float32))
    s = jnp.asarray(rng.standard_normal((4, 2, 5, 3)).astype(np.float32))

    def loss_fn(o, s):
        corr = circular_correlation(o, s)
        d, _ = chord_distance(o, s, corr)
        return dsm_triplet_loss(d)

    go, gs = jax.grad(loss_fn, argnums=(0, 1))(o, s)
    assert np.all(np.isfinite(np.asarray(go)))
    assert np.all(np.isfinite(np.asarray(gs)))
    assert float(jnp.sum(jnp.abs(go))) > 0
    assert float(jnp.sum(jnp.abs(gs))) > 0


def test_soft_margin_losses_finite_at_large_deltas(rng):
    """alpha*delta >> 88 must not overflow to inf loss / NaN grads (the
    reference's log(1+exp(.)) flaw; both losses use stable softplus)."""
    from witw_tpu.match.losses import dsm_triplet_loss

    # embeddings far apart -> squared distances in the hundreds
    e1 = 20.0 * rng.standard_normal((4, 8)).astype(np.float32)
    e2 = -20.0 * rng.standard_normal((4, 8)).astype(np.float32)
    loss, grads = jax.value_and_grad(
        lambda a, b: exhaustive_minibatch_triplet_loss(a, b, soft_margin=True)
    )(jnp.asarray(e1), jnp.asarray(e2))
    assert np.isfinite(float(loss))
    assert np.all(np.isfinite(np.asarray(grads)))

    d = jnp.asarray(100.0 * np.abs(rng.standard_normal((4, 4))), jnp.float32)
    loss2, grad2 = jax.value_and_grad(dsm_triplet_loss)(d)
    assert np.isfinite(float(loss2))
    assert np.all(np.isfinite(np.asarray(grad2)))
