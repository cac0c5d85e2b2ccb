from .mesh import (
    make_mesh,
    replicated_sharding,
    batch_sharding,
    shard_batch,
    local_device_count,
    maybe_initialize_distributed,
    all_gather_host_objects,
    mesh_size_from_args,
)

__all__ = [
    "make_mesh",
    "replicated_sharding",
    "batch_sharding",
    "shard_batch",
    "local_device_count",
    "maybe_initialize_distributed",
    "all_gather_host_objects",
    "mesh_size_from_args",
]
