from .mesh import create_mesh, shard_batch, replicate_tree, batch_sharding
from .distributed import initialize_multihost

__all__ = [
    "create_mesh",
    "shard_batch",
    "replicate_tree",
    "batch_sharding",
    "initialize_multihost",
]
