"""Shared model/data/step logic for the 2-process multi-host test.

Imported both by the in-process reference run (tests/test_multihost.py)
and by the spawned worker processes (tests/multihost_worker.py), so the
two sides are guaranteed to compute the same program on the same data.

The comparison contract: the global batch is partitioned across processes
with the DataLoader's strided ``process_index::process_count`` slicing,
and each process's rows land on its own addressable devices (mesh devices
``4p..4p+3``). The single-process reference therefore feeds the SAME
row->device assignment by concatenating the per-process row sets before
its contiguous shard_batch — making the shard_map train step (per-shard
BatchNorm moments included) bitwise-comparable across the two topologies.
"""

from __future__ import annotations

import numpy as np

GLOBAL_BATCH = 16
IMG_W = 64
N_CLASSES = 12
TEXT_LEN = 6
DEVICES_PER_PROC = 4


def make_model():
    from ocrs_models_tpu.models.recognition import RecognitionModel

    # Small CPU-friendly CRNN; explicit scan/xla backends so the program
    # is identical no matter which platform quirks "auto" would resolve.
    return RecognitionModel(
        n_classes=N_CLASSES,
        gru_hidden=32,
        gru_layers=1,
        gru_backend="scan",
        conv_backend="xla",
    )


def make_global_dataset() -> list[dict]:
    """Deterministic per-sample dicts (a list => usable as a DataLoader
    dataset)."""
    rng = np.random.default_rng(42)
    samples = []
    for _ in range(GLOBAL_BATCH):
        samples.append(
            {
                "image": rng.uniform(-0.5, 0.5, size=(64, IMG_W, 1)).astype(
                    np.float32
                ),
                "text": rng.integers(
                    1, N_CLASSES, size=(TEXT_LEN,)
                ).astype(np.int32),
                "text_len": np.int32(TEXT_LEN),
                "image_width": np.int32(IMG_W),
                "sample_weight": np.float32(1.0),
            }
        )
    return samples


def collate(samples: list[dict]) -> dict:
    return {
        k: np.stack([s[k] for s in samples]) for k in samples[0]
    }


def one_train_step(local_batch: dict) -> dict:
    """Mesh over ALL devices, fresh replicated state, ONE shard_map train
    step on the given (process-local) batch; returns host-side scalars."""
    import jax
    import jax.numpy as jnp

    from ocrs_models_tpu.parallel import create_mesh, replicate_tree, shard_batch
    from ocrs_models_tpu.training.state import create_train_state
    from ocrs_models_tpu.training.steps import make_recognition_steps

    model = make_model()
    mesh = create_mesh()
    state = create_train_state(
        model,
        jax.random.key(0),
        jnp.zeros((1, 64, IMG_W, 1)),
        grad_clip_norm=4.0,
    )
    state = replicate_tree(state, mesh)
    train_step, eval_step = make_recognition_steps(
        model, mesh=mesh, force_shard_map=True
    )
    batch = shard_batch(local_batch, mesh)
    new_state, metrics = train_step(state, batch, jnp.float32(1e-3))
    ev = eval_step(new_state, shard_batch(local_batch, mesh))

    def host_scalar(x) -> float:
        shards = getattr(x, "addressable_shards", None)
        if shards:
            return float(np.asarray(shards[0].data))
        return float(np.asarray(x))

    # Parameter checksum over the replicated post-update tree, computed on
    # host from this process's addressable replica.
    checksum = 0.0
    for leaf in jax.tree.leaves(new_state.params):
        shards = getattr(leaf, "addressable_shards", None)
        arr = np.asarray(shards[0].data) if shards else np.asarray(leaf)
        checksum += float(np.sum(np.abs(arr), dtype=np.float64))
    return {
        "loss": host_scalar(metrics["loss"]),
        "grad_norm": host_scalar(metrics["grad_norm"]),
        "eval_loss": host_scalar(ev["loss"]),
        "param_checksum": checksum,
    }
