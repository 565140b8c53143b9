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


def global_batch_from_local(batch, mesh: Mesh):
    """Multi-host batch assembly: each process contributes its local shard of
    the global batch (per-host data loading; the global batch axis spans all
    processes' devices). Single-process falls back to :func:`shard_batch`."""
    if jax.process_count() == 1:
        return shard_batch(batch, mesh)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(
            batch_sharding(mesh, np.ndim(x)), np.asarray(x)
        ),
        batch,
    )


def initialize_distributed(coordinator: str = None, num_processes: int = None,
                           process_id: int = None) -> None:
    """Multi-host runtime bring-up (jax.distributed). No-op when the
    environment provides auto-detection (TPU pods)."""
    kwargs = {}
    if coordinator is not None:
        kwargs = dict(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
        )
    jax.distributed.initialize(**kwargs)
