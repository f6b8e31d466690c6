from .mesh import (get_mesh, data_sharding, replicated_sharding,
                   shard_batch, unshard, local_device_count)

__all__ = [
    "get_mesh", "data_sharding", "replicated_sharding", "shard_batch",
    "unshard", "local_device_count"
]
