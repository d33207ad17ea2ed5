from .mesh import (make_mesh, data_sharding, replicated_sharding,
                   shard_batch, local_device_count)

__all__ = [
    "make_mesh",
    "data_sharding",
    "replicated_sharding",
    "shard_batch",
    "local_device_count",
]
