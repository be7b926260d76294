from .mesh import create_mesh, shard_batch, replicate_tree, batch_sharding

__all__ = ["create_mesh", "shard_batch", "replicate_tree", "batch_sharding"]
