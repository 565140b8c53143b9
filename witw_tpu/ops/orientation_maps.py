"""Orientation-map channels (Liu & Li, CVPR 2019).

The reference carries this as commented-out dead code
(model/cvig_baseline.py:163-206): u-v coordinate channels appended to the
input image — plain normalized coordinates for the surface view, and
(radius, azimuth) for the overhead view. Provided here as a live, tested op
(the baseline encoder accepts extra bands via ``BaselineModelConfig.bands`` /
``orientation``), computed once per static shape and broadcast over the
batch.
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=16)
def orientation_map(height: int, width: int, view: str = "surface") -> np.ndarray:
    """[2, H, W] float32 u-v map. surface: normalized row/col coordinates in
    [-1, 1]; overhead: (normalized radius, azimuth/pi)."""
    shape = (height, width)
    shape_expanded = np.expand_dims(np.array(shape), (1, 2))
    shape_max = max(shape)
    uv = np.indices(shape, dtype=float)
    uv = (2 * uv - shape_expanded + 1) / (shape_max - 1)
    if view == "overhead":
        radius = (np.sqrt(uv[0] ** 2 + uv[1] ** 2) / math.sqrt(2)) * 2.0 - 1.0
        azimuth = np.arctan2(uv[1], -uv[0]) / math.pi
        uv = np.stack([radius, azimuth])
    return uv.astype(np.float32)


def append_orientation_maps(
    surface: jax.Array, overhead: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """Append the two u-v channels to NHWC surface/overhead batches.

    The batches are in the raw 0-255 image domain here, and the baseline
    encoder rescales EVERY input channel with ``-1 + 2*(x/255)``
    (reference cvig_baseline.py:265-266, which would have done the same to
    the dead OrientationMaps transform's output). Emitting uv directly in
    [-1, 1] would therefore collapse the channels to a near-constant ~-1, so
    they are pre-encoded into the image domain as ``(uv + 1) * 127.5`` — the
    encoder's rescale maps them back to the intended [-1, 1] uv exactly.
    """

    def extend(x: jax.Array, view: str) -> jax.Array:
        b, h, w, _ = x.shape
        uv = jnp.asarray(orientation_map(h, w, view))  # [2, H, W] in [-1, 1]
        uv = (uv + 1.0) * 127.5  # image domain; encoder rescale inverts this
        uv = jnp.broadcast_to(jnp.transpose(uv, (1, 2, 0))[None], (b, h, w, 2))
        return jnp.concatenate([x, uv.astype(x.dtype)], axis=-1)

    return extend(surface, "surface"), extend(overhead, "overhead")
