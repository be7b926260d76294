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
    """Fully replicate a pytree across the mesh.

    In a multi-process run every process must pass the same host value
    (e.g. parameters initialized from the same seed); the result is a
    global array replicated over all — including non-addressable — devices.
    """
    sharding = NamedSharding(mesh, P())
    if jax.process_count() == 1:
        return jax.device_put(tree, sharding)

    def put(x):
        x = np.asarray(x)
        return jax.make_array_from_process_local_data(sharding, x, x.shape)

    return jax.tree.map(put, tree)


def shard_batch(batch: Any, mesh: Mesh, axis: str = "data") -> Any:
    """Device-put a host batch with its leading dim split across the mesh.

    Leading dims must be divisible by the mesh size (collation pads batches
    to a multiple of the mesh size before this point).

    Multi-process (multi-host) runs pass each process's LOCAL shard of the
    sample space (the DataLoader's ``process_index``/``process_count``
    slicing); the result is a global array of batch size
    ``local_n * process_count`` whose rows land on this process's
    addressable devices — data never crosses DCN at load time.
    """
    sharding = batch_sharding(mesh, axis)
    nproc = jax.process_count()

    def put(x):
        x = np.asarray(x)
        if nproc == 1:
            return jax.device_put(x, sharding)
        global_shape = (x.shape[0] * nproc,) + x.shape[1:]
        return jax.make_array_from_process_local_data(sharding, x, global_shape)

    return jax.tree.map(put, batch)


def create_mesh_2d(
    dp: int,
    mp: int,
    axes: tuple[str, str] = ("data", "model"),
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """2-D (data x model) mesh for tensor-parallel demonstrations.

    At the reference's model sizes data parallelism is the production
    choice (see module docstring); this exists to exercise and validate
    TP shardings end-to-end (layout transformer; `__graft_entry__`'s
    multi-chip dry run and tests/test_parallel_tp.py assert loss parity
    against the replicated step).
    """
    if devices is None:
        devices = jax.devices()
    devices = np.asarray(devices[: dp * mp]).reshape(dp, mp)
    return Mesh(devices, axes)


def layout_tp_spec(path, axis: str = "model"):
    """Megatron-style PartitionSpec for one layout-encoder parameter:
    column-parallel qkv / linear1 (outputs sharded over ``axis``),
    row-parallel out_proj / linear2 (inputs sharded; XLA inserts the
    all-reduce after the contraction), everything else replicated."""
    keys = [getattr(p, "key", getattr(p, "name", None)) for p in path]
    name = keys[-1] if keys else None
    parent = keys[-2] if len(keys) > 1 else None
    if name == "qkv_kernel" or (parent == "linear1" and name == "kernel"):
        return P(None, axis)
    if name == "qkv_bias" or (parent == "linear1" and name == "bias"):
        return P(axis)
    if parent in ("linear2", "out_proj") and name == "kernel":
        return P(axis, None)
    return P()


def layout_tp_state_shardings(state: Any, mesh: Mesh, axis: str = "model") -> Any:
    """NamedSharding tree for a layout ``TrainState``: parameters and the
    Adam moments (which mirror the parameter tree) follow
    :func:`layout_tp_spec`; every other leaf is replicated."""
    by_key = {
        jax.tree_util.keystr(p): layout_tp_spec(p, axis)
        for p, _ in jax.tree_util.tree_leaves_with_path(state.params)
    }

    def assign(path, leaf):
        ks = jax.tree_util.keystr(path)
        for marker in (".params", ".mu", ".nu"):
            if marker + "[" in ks:
                rest = ks.split(marker, 1)[1]
                if rest in by_key:
                    return NamedSharding(mesh, by_key[rest])
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(assign, state)


def shard_tree(tree: Any, shardings: Any) -> Any:
    """Device-put a pytree leaf-wise onto the given sharding tree."""
    return jax.tree.map(jax.device_put, tree, shardings)
