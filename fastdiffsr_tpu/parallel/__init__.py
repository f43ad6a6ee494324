from .mesh import (make_mesh, auto_mesh, batch_sharding,
                   replicated_sharding, shard_batch)
from .multihost import (global_mesh, shard_local_batch, replicate,
                        fetch_replicated)

__all__ = ["make_mesh", "auto_mesh", "batch_sharding",
           "replicated_sharding", "shard_batch",
           "global_mesh", "shard_local_batch", "replicate",
           "fetch_replicated"]
