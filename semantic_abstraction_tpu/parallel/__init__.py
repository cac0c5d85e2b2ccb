from .mesh import (
    make_mesh,
    replicated_sharding,
    batch_sharding,
    shard_batch,
    local_device_count,
)

__all__ = [
    "make_mesh",
    "replicated_sharding",
    "batch_sharding",
    "shard_batch",
    "local_device_count",
]
