"""Device mesh and sharding utilities — the communication backend.

The reference is single-device, single-process (SURVEY.md §2.3: no DDP, no
NCCL anywhere). This module is the TPU-native replacement: a 1-D
``jax.sharding.Mesh`` over all local+remote chips, batches sharded along a
``data`` axis, parameters replicated, and gradient all-reduce left to XLA's
GSPMD partitioner (collectives ride ICI within a slice, DCN across hosts).
At the reference's model sizes (<= 4.7M params) data parallelism is the only
strategy with functional justification; tensor/pipeline axes are unneeded.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(
    num_devices: Optional[int] = None,
    axis: str = "data",
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Create a 1-D data-parallel mesh over the given (default: all) devices."""
    if devices is None:
        devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (axis,))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Sharding that splits the leading (batch) dim across the mesh."""
    return NamedSharding(mesh, P(axis))


def replicate_tree(tree: Any, mesh: Mesh) -> Any:
    """Fully replicate a pytree across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_batch(batch: Any, mesh: Mesh, axis: str = "data") -> Any:
    """Device-put a host batch with its leading dim split across the mesh.

    Leading dims must be divisible by the mesh size (collation pads batches
    to a multiple of the mesh size before this point).
    """
    sharding = batch_sharding(mesh, axis)

    def put(x):
        x = np.asarray(x)
        return jax.device_put(x, sharding)

    return jax.tree.map(put, batch)
