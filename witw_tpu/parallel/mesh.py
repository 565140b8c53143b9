"""Device mesh + sharding helpers.

The reference is single-process single-GPU with no collectives of any kind
(SURVEY.md §2.4). The TPU-native scaling story is GSPMD: a (data, gallery)
mesh; training shards the batch over ``data``; full-gallery retrieval shards
the gallery axis over ``gallery`` so the query x gallery correlation and the
rank reduction ride ICI collectives inserted by XLA.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
GALLERY_AXIS = "gallery"


def make_mesh(
    n_data: int = -1,
    n_gallery: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if n_data <= 0:
        n_data = len(devices) // max(n_gallery, 1)
    n = n_data * n_gallery
    assert n <= len(devices), (n_data, n_gallery, len(devices))
    grid = np.asarray(devices[:n]).reshape(n_data, n_gallery)
    return Mesh(grid, (DATA_AXIS, GALLERY_AXIS))


def batch_sharding(mesh: Mesh, ndim: int = 4) -> NamedSharding:
    """Shard leading (batch) axis over the data axis, replicate the rest."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def gallery_sharding(mesh: Mesh, ndim: int = 4) -> NamedSharding:
    """Shard leading (gallery) axis over *all* mesh devices — eval repurposes
    the whole mesh for the gallery dimension."""
    return NamedSharding(mesh, P((DATA_AXIS, GALLERY_AXIS), *([None] * (ndim - 1))))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Device-put a pytree of host arrays with the batch axis sharded."""
    return jax.tree.map(
        lambda x: jax.device_put(x, batch_sharding(mesh, np.ndim(x))), batch
    )
