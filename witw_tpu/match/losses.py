"""Metric-learning losses in closed matrix form.

- DSM soft-margin triplet loss over a precomputed [B, B] distance matrix
  (reference model/cvig_fov.py:366-382).
- Exhaustive-minibatch triplet loss: the reference iterates over B-1 `roll`
  shifts in Python — O(B) kernel launches (reference
  model/cvig_baseline.py:286-315). Algebraically the shifts enumerate every
  off-diagonal of the pairwise squared-distance matrix, so here it is one
  B x B matmul plus a masked reduction (SURVEY.md §2.1 notes this identity).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def dsm_triplet_loss(
    distances: jax.Array, alpha: float = 10.0, valid: jax.Array = None
) -> jax.Array:
    """Soft-margin triplet loss on a [B, B] distance matrix whose diagonal
    holds the matching pairs (reference cvig_fov.py:366-382). Both
    query->gallery and gallery->query directions, normalized by 2B(B-1).
    The diagonal contributes the same constant 2B*log(2) as the reference.

    ``valid``: optional bool [B] marking real rows in a padded batch (the
    sharded straggler path pads to the data-axis multiple); restricting the
    pair sums and the normalizer to valid x valid pairs makes the result
    exactly the unpadded batch's loss."""
    matching = jnp.diagonal(distances)
    d_s2o = matching[None, :] - distances  # matching_dists - distances
    d_o2s = matching[:, None] - distances
    # softplus == log(1+exp(x)) exactly, but stays finite past x ~ 88 where
    # float32 exp overflows to inf (and the gradient to NaN).
    if valid is None:
        b = distances.shape[0]
        loss = jnp.sum(jax.nn.softplus(alpha * d_s2o)) + jnp.sum(
            jax.nn.softplus(alpha * d_o2s)
        )
        return loss / (2.0 * b * (b - 1))
    v = valid.astype(jnp.float32)
    pair = v[:, None] * v[None, :]
    nv = jnp.sum(v)
    loss = jnp.sum(jax.nn.softplus(alpha * d_s2o) * pair) + jnp.sum(
        jax.nn.softplus(alpha * d_o2s) * pair
    )
    return loss / jnp.maximum(2.0 * nv * (nv - 1.0), 1.0)


def pairwise_sq_distances(embed1: jax.Array, embed2: jax.Array) -> jax.Array:
    """D2[i, j] = ||embed1[i] - embed2[j]||^2 via one GEMM."""
    e1 = embed1.astype(jnp.float32)
    e2 = embed2.astype(jnp.float32)
    sq1 = jnp.sum(e1 * e1, axis=-1)
    sq2 = jnp.sum(e2 * e2, axis=-1)
    cross = jnp.einsum("id,jd->ij", e1, e2, precision=jax.lax.Precision.HIGHEST)
    d2 = sq1[:, None] + sq2[None, :] - 2.0 * cross
    return jnp.maximum(d2, 0.0)


def exhaustive_minibatch_triplet_loss(
    embed1: jax.Array,
    embed2: jax.Array,
    soft_margin: bool = False,
    alpha: float = 10.0,
    margin: float = 1.0,
    valid: jax.Array = None,
) -> jax.Array:
    """All valid (anchor, positive, negative) triplets from a minibatch of
    paired embeddings, squared Euclidean distances (reference
    cvig_baseline.py:286-315; arXiv:1608.00161 §5.3).

    With D2 the pairwise squared-distance matrix and d_i = D2[i, i], the
    reference's two roll orderings sum, over all i != j,
    f(d_i - D2[i, j]) + f(d_i - D2[j, i]), normalized by 2B(B-1).

    ``valid``: optional bool [B]; pair terms and the normalizer restrict to
    valid x valid — exactly the unpadded batch's loss (see dsm_triplet_loss).
    """
    b = embed1.shape[0]
    d2 = pairwise_sq_distances(embed1, embed2)
    diag = jnp.diagonal(d2)
    delta_rows = diag[:, None] - d2  # f(d_i - D2[i, j])
    delta_cols = diag[:, None] - d2.T  # f(d_i - D2[j, i])
    if soft_margin:
        # stable softplus form; the reference's log(1+exp(.)) overflows for
        # unbounded squared-Euclidean deltas (alpha*delta > ~88)
        f_rows = jax.nn.softplus(alpha * delta_rows)
        f_cols = jax.nn.softplus(alpha * delta_cols)
    else:
        f_rows = jax.nn.relu(delta_rows + margin)
        f_cols = jax.nn.relu(delta_cols + margin)
    mask = 1.0 - jnp.eye(b)
    if valid is None:
        loss = jnp.sum((f_rows + f_cols) * mask)
        return loss / (2.0 * b * (b - 1))
    v = valid.astype(jnp.float32)
    mask = mask * (v[:, None] * v[None, :])
    nv = jnp.sum(v)
    loss = jnp.sum((f_rows + f_cols) * mask)
    return loss / jnp.maximum(2.0 * nv * (nv - 1.0), 1.0)
