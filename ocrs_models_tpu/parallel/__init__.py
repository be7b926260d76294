from .mesh import (
    batch_sharding,
    create_mesh,
    create_mesh_2d,
    layout_tp_state_shardings,
    replicate_tree,
    shard_batch,
    shard_tree,
)
from .distributed import initialize_multihost

__all__ = [
    "create_mesh",
    "create_mesh_2d",
    "shard_batch",
    "shard_tree",
    "replicate_tree",
    "batch_sharding",
    "layout_tp_state_shardings",
    "initialize_multihost",
]
