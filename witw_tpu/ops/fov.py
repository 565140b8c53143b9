"""Field-of-view crop with horizontal wraparound.

The reference crops a random-origin window out of the 512-wide panorama,
wrapping around the seam with a tensor concat (reference
model/cvig_fov.py:117-129). Here it is a static-shape modular gather, batched
over per-sample start offsets, so it runs inside jit with no dynamic shapes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def random_fov_starts(rng: jax.Array, batch: int, width_max: int) -> jax.Array:
    """Per-sample random crop origins in [0, width_max) (reference
    cvig_fov.py:121)."""
    return jax.random.randint(rng, (batch,), 0, width_max)


def fov_crop(surface: jax.Array, starts: jax.Array, width: int) -> jax.Array:
    """Crop a width-`width` window starting at per-sample `starts`, wrapping
    around the panorama seam.

    surface: [B, H, W_max, C] NHWC. starts: int [B]. Returns [B, H, width, C].
    """
    w_max = surface.shape[2]
    cols = (starts[:, None] + jnp.arange(width)[None, :]) % w_max  # [B, width]
    return jnp.take_along_axis(surface, cols[:, None, :, None], axis=2)
