from witw_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    replicated_sharding,
    gallery_sharding,
    shard_batch,
    global_batch_from_local,
    initialize_distributed,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated_sharding",
    "gallery_sharding",
    "shard_batch",
    "global_batch_from_local",
    "initialize_distributed",
]
