from .mesh import (
    make_mesh,
    shard_batch,
    replicate,
    batch_sharding,
    process_local_mesh_info,
)

__all__ = [
    "make_mesh",
    "shard_batch",
    "replicate",
    "batch_sharding",
    "process_local_mesh_info",
]
