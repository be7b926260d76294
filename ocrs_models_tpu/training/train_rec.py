"""Text recognition trainer CLI.

Capability parity with the reference's ``python -m ocrs_models.train_rec``
(train_rec.py): HierText line crops (or the synthetic dataset), CTC loss
with ``W//4`` input lengths, Adam(1e-3) + reduce-on-plateau, global-norm
grad clip 4.0, per-epoch CER, sample-prediction previews, checkpoint every
epoch, NaN-loss guard — now as a data-parallel pjit loop over a device
mesh with bf16 conv compute.

Usage:
    python -m ocrs_models_tpu.training.train_rec hiertext <data_dir> [...]
    python -m ocrs_models_tpu.training.train_rec synthetic - --max-epochs 2
"""

from __future__ import annotations

import math
from argparse import ArgumentParser, BooleanOptionalAction

import jax
import jax.numpy as jnp
import numpy as np

from ..config import (
    DEFAULT_ALPHABET,
    MeshConfig,
    RecognitionModelConfig,
    RecognitionTrainConfig,
)
from ..data import DataLoader, SyntheticRecognition, collate_recognition
from ..data.augment import RecognitionAugment
from ..models import RecognitionModel
from ..parallel import create_mesh, replicate_tree, shard_batch
from ..utils.checkpoint import load_checkpoint, save_checkpoint
from ..utils.logging import MetricsLogger
from ..utils.metrics import RecognitionAccuracyStats
from ..utils.text import ctc_greedy_decode_text, decode_text
from .schedules import ReduceLROnPlateau
from .state import create_train_state
from .steps import make_recognition_steps


def preview_predictions(batch, preds, alphabet: str, tag: str, limit: int = 10):
    input_lengths = batch["image_width"] // 4
    for i in range(min(limit, len(preds))):
        if batch["sample_weight"][i] == 0:
            continue
        target = decode_text(
            batch["text"][i][: batch["text_len"][i]], alphabet
        )
        pred = ctc_greedy_decode_text(preds[i][: input_lengths[i]], alphabet)
        print(f'Sample {tag} prediction "{pred}" target "{target}"')


def run_epoch(
    loader, mesh, state, step_fn, alphabet, lr=None, epoch=0, train=True
):
    from ..data.loader import device_prefetch
    from ..utils.profiling import Throughput

    stats = RecognitionAccuracyStats(alphabet)
    throughput = Throughput(warmup=1, n_chips=mesh.size)
    total_loss = 0.0
    total_grad_norm = 0.0
    n_batches = 0
    prefetched = device_prefetch(
        iter(loader), put_fn=lambda b: shard_batch(b, mesh), depth=2
    )
    for batch_idx, (batch, sharded) in enumerate(prefetched):
        if train:
            state, metrics = step_fn(state, sharded, jnp.float32(lr))
        else:
            metrics = step_fn(state, sharded)
        loss = float(metrics["loss"])
        if math.isnan(loss):
            raise RuntimeError(
                "Training produced invalid loss. Check input and target "
                "lengths are compatible with CTC loss"
            )
        preds = np.asarray(metrics["preds"])
        valid = batch["sample_weight"] > 0
        stats.update(
            batch["text"][valid],
            batch["text_len"][valid],
            preds[valid],
            (batch["image_width"] // 4)[valid],
        )
        if batch_idx == 0:
            preview_predictions(batch, preds, alphabet, "train" if train else "test")
        total_loss += loss
        if train:
            total_grad_norm += float(metrics["grad_norm"])
        n_batches += 1
        throughput.update(int(valid.sum()))
    mean_loss = total_loss / max(n_batches, 1)
    if train:
        print(f"Mean grad norm {total_grad_norm / max(n_batches, 1):.3f}")
        if throughput.updates > throughput.warmup:
            print(f"Throughput {throughput.last_rate:.0f} crops/sec/chip")
        return state, mean_loss, stats
    return mean_loss, stats


def main(argv=None):
    parser = ArgumentParser(description="Train text recognition model.")
    parser.add_argument("dataset_type", choices=["hiertext", "synthetic"])
    parser.add_argument("data_dir")
    parser.add_argument(
        "--augment", default=True, action=BooleanOptionalAction,
        help="Enable data augmentations",
    )
    parser.add_argument("--batch-size", type=int, default=None)
    parser.add_argument("--checkpoint", type=str, help="Checkpoint dir to load")
    parser.add_argument("--export", type=str, help="Export weights (.npz or .pt)")
    parser.add_argument("--lr", type=float, help="Initial learning rate")
    parser.add_argument(
        "--plateau-patience",
        type=int,
        default=RecognitionTrainConfig().plateau_patience,
        help="Epochs without val-loss improvement before the LR decays "
        "(raise for tiny datasets where epochs are few steps)",
    )
    parser.add_argument("--max-epochs", type=int)
    parser.add_argument("--max-images", type=int)
    parser.add_argument("--validate-only", action="store_true")
    parser.add_argument("--num-devices", type=int, default=None)
    parser.add_argument(
        "--grad-accum", type=int, default=1,
        help="Microbatches per optimizer step (lax.scan inside the jitted "
        "step; ~k-times lower activation memory at identical math)",
    )
    parser.add_argument(
        "--bf16", default=True, action=BooleanOptionalAction,
        help="bfloat16 conv compute (GRU stays fp32)",
    )
    args = parser.parse_args(argv)

    # Fail fast (with a diagnostic) instead of hanging if the TPU runtime
    # is wedged — a bounded subprocess probe, see utils/backend.py.
    from ..utils.backend import ensure_backend

    ensure_backend()

    cfg = RecognitionTrainConfig()
    batch_size = args.batch_size or cfg.batch_size
    seed = cfg.seed

    augment = RecognitionAugment(seed=seed) if args.augment else None
    val_max = max(10, int(args.max_images * 0.1)) if args.max_images else None
    if args.dataset_type == "hiertext":
        from ..data.hiertext import HierTextRecognition

        train_ds = HierTextRecognition(
            args.data_dir, train=True, max_images=args.max_images, transform=augment
        )
        val_ds = HierTextRecognition(args.data_dir, train=False, max_images=val_max)
    else:
        train_ds = SyntheticRecognition(
            size=args.max_images or 512, seed=seed, transform=augment
        )
        val_ds = SyntheticRecognition(size=val_max or 64, seed=seed + 1)

    mesh_cfg = MeshConfig()
    mesh = create_mesh(
        num_devices=args.num_devices or mesh_cfg.num_devices, axis=mesh_cfg.data_axis
    )
    collate = lambda s: collate_recognition(  # noqa: E731
        s, width_step=cfg.width_step,
        batch_multiple=mesh.size * args.grad_accum, max_width=cfg.max_width
    )
    train_loader = DataLoader(
        train_ds, batch_size, collate, shuffle=True, seed=seed, num_threads=2
    )
    val_loader = DataLoader(val_ds, batch_size, collate, shuffle=True, seed=seed)

    mcfg = RecognitionModelConfig()
    model = RecognitionModel(
        n_classes=mcfg.n_classes,
        gru_hidden=mcfg.gru_hidden,
        gru_layers=mcfg.gru_layers,
        dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
    )
    state = create_train_state(
        model,
        jax.random.key(seed),
        jnp.zeros((1, 64, 64, 1)),
        grad_clip_norm=cfg.grad_clip_norm,
    )
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(state.params))
    print(f"Model param count {n_params}")

    epoch = 0
    if args.checkpoint:
        state, epoch = load_checkpoint(args.checkpoint, state)
    state = replicate_tree(state, mesh)

    if args.export:
        from .export_utils import export_weights

        export_weights(state, args.export, model="recognition")
        return

    # Collation pads every batch to a multiple of mesh.size * grad_accum
    # (zero-weight rows), so any --batch-size is valid.
    train_step, eval_step = make_recognition_steps(
        model, mesh=mesh, grad_accum=args.grad_accum
    )

    if args.validate_only:
        val_loss, val_stats = run_epoch(
            val_loader, mesh, state, eval_step, DEFAULT_ALPHABET, train=False
        )
        print(
            f"Validation loss {val_loss} char error rate {val_stats.char_error_rate()}"
        )
        return

    initial_lr = args.lr or cfg.learning_rate
    scheduler = ReduceLROnPlateau(
        initial_lr, factor=cfg.plateau_factor, patience=args.plateau_patience
    )
    logger = MetricsLogger(
        "text-recognition",
        config={
            "batch_size": batch_size,
            "dataset_size": len(train_ds),
            "model_params": n_params,
            "seed": seed,
            "mesh_devices": mesh.size,
        },
    )

    lr = initial_lr
    while args.max_epochs is None or epoch < args.max_epochs:
        state, train_loss, train_stats = run_epoch(
            train_loader, mesh, state, train_step, DEFAULT_ALPHABET, lr=lr,
            epoch=epoch, train=True,
        )
        print(
            f"Epoch {epoch} train loss {train_loss} "
            f"char error rate {train_stats.char_error_rate()}"
        )
        val_loss, val_stats = run_epoch(
            val_loader, mesh, state, eval_step, DEFAULT_ALPHABET, train=False
        )
        print(
            f"Epoch {epoch} validation loss {val_loss} "
            f"char error rate {val_stats.char_error_rate()}"
        )
        lr = scheduler.step(val_loss)
        print(f"Current learning rate [{lr}]")

        logger.log(
            {
                "train_loss": train_loss,
                "train_accuracy": train_stats.stats_dict(),
                "val_loss": val_loss,
                "val_accuracy": val_stats.stats_dict(),
            },
            step=epoch,
        )
        save_checkpoint(cfg.checkpoint_name, state, epoch)
        epoch += 1


if __name__ == "__main__":
    main()
