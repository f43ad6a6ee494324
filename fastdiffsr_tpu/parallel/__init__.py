from .mesh import (make_mesh, auto_mesh, batch_sharding,
                   replicated_sharding, shard_batch)

__all__ = ["make_mesh", "auto_mesh", "batch_sharding",
           "replicated_sharding", "shard_batch"]
