"""Materialized (reference-semantics) alignment + distance.

Direct JAX transcription of the reference's crop-then-normalize pipeline
(reference model/cvig_fov.py:318-363). Kept as the correctness oracle for the
streaming implementation in :mod:`witw_tpu.match.distance` and for small-batch
use; the streaming form avoids this O(Bo*Bs*c*h*s_w) tensor entirely.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def crop_overhead_materialized(
    overhead_embed: jax.Array,
    orientation: jax.Array,
    surface_width: int,
) -> jax.Array:
    """Roll every overhead map to each query's estimated orientation and crop
    to the surface width (reference cvig_fov.py:318-343).

    overhead_embed: [Bo, h, W, c]; orientation: [Bo, Bs].
    Returns [Bo, Bs, h, surface_width, c].
    """
    bo, h, w, c = overhead_embed.shape
    bs = orientation.shape[1]
    # cols[bo, bs, k] = (k + orientation[bo, bs]) mod W for k < surface_width.
    cols = (jnp.arange(surface_width)[None, None, :] + orientation[:, :, None]) % w
    # Gather along width: [Bo, Bs, h, s_w, c].
    tiled = jnp.broadcast_to(overhead_embed[:, None], (bo, bs, h, w, c))
    return jnp.take_along_axis(tiled, cols[:, :, None, :, None], axis=3)


def chord_distance_materialized(
    overhead_cropped: jax.Array, surface_embed: jax.Array
) -> jax.Array:
    """L2-normalize both flattened embeddings, chord distance = 2*(1-cos)
    (reference cvig_fov.py:346-363).

    overhead_cropped: [Bo, Bs, h, s_w, c]; surface_embed: [Bs, h, s_w, c].
    Returns [Bo, Bs].
    """
    bo, bs = overhead_cropped.shape[:2]
    o = overhead_cropped.astype(jnp.float32).reshape(bo, bs, -1)
    o = o / jnp.linalg.norm(o, axis=-1, keepdims=True)
    s = surface_embed.astype(jnp.float32).reshape(bs, -1)
    s = s / jnp.linalg.norm(s, axis=-1, keepdims=True)
    cos = jnp.einsum("abd,bd->ab", o, s, precision=jax.lax.Precision.HIGHEST)
    return 2.0 * (1.0 - cos)
