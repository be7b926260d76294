"""Orbax checkpointing.

Replaces the reference's ``torch.save({epoch, model_state, optimizer_state})``
(train_detection.py:198-215) with Orbax: atomic, async-capable, and
sharding-aware (a checkpoint written from an N-chip mesh restores onto any
other mesh). The stored tree is ``{step, epoch, params, batch_stats,
opt_state}`` plus a small JSON metadata blob.
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def _to_host(tree: Any) -> Any:
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_checkpoint(
    directory: str,
    state,
    epoch: int,
    extra: Optional[dict] = None,
) -> str:
    """Save a TrainState under ``directory`` (overwrites)."""
    directory = os.path.abspath(directory)
    payload = {
        "step": np.asarray(state.step),
        "params": _to_host(state.params),
        "batch_stats": _to_host(state.batch_stats),
        "opt_state": _to_host(state.opt_state),
    }
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(directory, payload, force=True)
    meta = {"epoch": int(epoch)}
    if extra:
        meta.update(extra)
    with open(os.path.join(directory, "meta.json"), "w") as f:
        json.dump(meta, f)
    return directory


def load_checkpoint(directory: str, state) -> tuple[Any, int]:
    """Restore a TrainState saved by :func:`save_checkpoint`.

    Returns ``(state, epoch)``; the restored arrays adopt the template
    state's structure.
    """
    directory = os.path.abspath(directory)
    template = {
        "step": np.asarray(state.step),
        "params": _to_host(state.params),
        "batch_stats": _to_host(state.batch_stats),
        "opt_state": _to_host(state.opt_state),
    }
    with ocp.PyTreeCheckpointer() as ckptr:
        restored = ckptr.restore(directory, item=template)
    state = state.replace(
        step=restored["step"],
        params=restored["params"],
        batch_stats=restored["batch_stats"],
        opt_state=restored["opt_state"],
    )
    epoch = 0
    meta_path = os.path.join(directory, "meta.json")
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            epoch = json.load(f).get("epoch", 0)
    return state, epoch
