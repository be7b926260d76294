"""Text detection trainer CLI.

Capability parity with the reference's ``python -m
ocrs_models.train_detection`` (train_detection.py): HierText/DDI-100 (or
synthetic) pages at 800x600, balanced BCE, Adam, word-level box metrics
every validation epoch, checkpoint on train-loss improvement, early stop
after 3 epochs without improvement, optional debug-image dumps — as a
data-parallel mesh loop.

Usage:
    python -m ocrs_models_tpu.training.train_detection hiertext <data_dir>
    python -m ocrs_models_tpu.training.train_detection synthetic - --max-epochs 2
"""

from __future__ import annotations

from argparse import ArgumentParser, BooleanOptionalAction

import jax
import jax.numpy as jnp
import numpy as np

from ..config import DetectionModelConfig, DetectionTrainConfig, MeshConfig
from ..data import DataLoader, SyntheticDetection, collate_detection
from ..data.augment import DetectionAugment
from ..geometry import box_match_metrics, extract_cc_quads
from ..models import DetectionModel
from ..parallel import create_mesh, replicate_tree, shard_batch
from ..utils.checkpoint import load_checkpoint, save_checkpoint
from ..utils.image import untransform_image
from ..utils.logging import MetricsLogger
from ..utils.metrics import format_metrics, get_metric_means
from .state import create_train_state
from .steps import make_detection_steps


def binarize_mask(mask: np.ndarray, threshold: float = 0.5) -> np.ndarray:
    return np.where(mask > threshold, 1.0, 0.0)


def save_debug_images(basename: str, image, pred_mask, target_mask) -> None:
    from PIL import Image

    Image.fromarray(untransform_image(image[..., 0])).save(f"{basename}_input.png")
    Image.fromarray(
        (np.clip(np.asarray(pred_mask)[..., 0], 0, 1) * 255).astype(np.uint8)
    ).save(f"{basename}_pred_mask.png")
    Image.fromarray(
        (np.clip(np.asarray(target_mask)[..., 0], 0, 1) * 255).astype(np.uint8)
    ).save(f"{basename}_mask.png")


def run_train_epoch(loader, mesh, state, train_step, lr, debug_images=False):
    import time

    total_loss, n_batches = 0.0, 0
    last_metrics = None
    for batch in loader:
        n_valid = batch.pop("n_valid", len(batch["image"]))
        batch.pop("path", None)
        sharded = shard_batch(batch, mesh)
        start = time.time()
        state, metrics = train_step(state, sharded, jnp.float32(lr))
        loss = float(metrics["loss"])
        sec_per_img = (time.time() - start) / max(n_valid, 1)
        total_loss += loss
        n_batches += 1
        last_metrics = metrics
        if debug_images and n_batches == 1 and n_valid:
            # Train-batch dumps (reference train_detection.py:102-109).
            save_debug_images(
                "train-sample",
                batch["image"][0],
                np.asarray(metrics["pred"])[0],
                batch["mask"][0],
            )
        print(f"  batch loss {loss:.4f} sec/img {sec_per_img:.3f}", end="\r")
    print()
    epoch_stats = {}
    if last_metrics is not None:
        epoch_stats = {
            "grad_norm": float(last_metrics["grad_norm"]),
            "grad_norms": {
                k: float(v) for k, v in last_metrics["grad_norms"].items()
            },
        }
    return state, total_loss / max(n_batches, 1), epoch_stats


def run_eval_epoch(loader, mesh, state, eval_step, debug_images=False):
    total_loss, n_batches = 0.0, 0
    metrics_list = []
    for batch in loader:
        n_valid = batch.pop("n_valid", len(batch["image"]))
        batch.pop("path", None)
        sharded = shard_batch(batch, mesh)
        out = eval_step(state, sharded)
        total_loss += float(out["loss"])
        n_batches += 1
        preds = np.asarray(out["pred"])[:n_valid]
        targets = batch["mask"][:n_valid]
        for i in range(n_valid):
            pred_quads = extract_cc_quads(binarize_mask(preds[i])[..., 0])
            target_quads = extract_cc_quads(binarize_mask(targets[i])[..., 0])
            metrics_list.append(box_match_metrics(pred_quads, target_quads))
        if debug_images and n_valid:
            save_debug_images("test-sample", batch["image"][0], preds[0], targets[0])
    return total_loss / max(n_batches, 1), get_metric_means(metrics_list)


def main(argv=None):
    parser = ArgumentParser(description="Train text detection model.")
    parser.add_argument("dataset_type", choices=["ddi", "hiertext", "synthetic"])
    parser.add_argument("data_dir")
    parser.add_argument("--batch-size", type=int, default=None)
    parser.add_argument("--checkpoint", type=str)
    parser.add_argument("--debug-images", action="store_true")
    parser.add_argument("--export", type=str)
    parser.add_argument("--max-epochs", type=int)
    parser.add_argument("--max-images", type=int)
    parser.add_argument("--validate-only", action="store_true")
    parser.add_argument(
        "--augment", default=True, action=BooleanOptionalAction
    )
    parser.add_argument("--num-devices", type=int, default=None)
    parser.add_argument(
        "--grad-accum", type=int, default=1,
        help="Microbatches per optimizer step (lax.scan inside the jitted "
        "step; the 800x600 page activations, not params, bound batch size)",
    )
    parser.add_argument("--lr", type=float, default=None)
    parser.add_argument(
        "--bf16", default=True, action=BooleanOptionalAction,
        help="bfloat16 conv compute",
    )
    parser.add_argument(
        "--mask-height", type=int, default=None,
        help="Training mask height (width = 0.75 * height)",
    )
    args = parser.parse_args(argv)

    # Fail fast (with a diagnostic) instead of hanging if the TPU runtime
    # is wedged — a bounded subprocess probe, see utils/backend.py.
    from ..utils.backend import ensure_backend

    ensure_backend()

    cfg = DetectionTrainConfig()
    if args.mask_height:
        cfg = DetectionTrainConfig(
            mask_height=args.mask_height, mask_width=int(args.mask_height * 0.75)
        )
    # Fail fast on sizes whose feature pyramid collapses before the bottom
    # level (6 rounds of 2x pooling) — otherwise the error surfaces only
    # after minutes of XLA compilation.
    if min(cfg.mask_height, cfg.mask_width) < 128:
        parser.exit(
            1,
            f"--mask-height {cfg.mask_height} gives mask {cfg.mask_size}; "
            "both dims must be >= 128 to survive the U-Net's 6 pooling "
            "levels\n",
        )
    batch_size = args.batch_size or cfg.batch_size
    seed = cfg.seed

    transform = DetectionAugment(cfg.mask_size, augment=args.augment, seed=seed)
    val_transform = DetectionAugment(cfg.mask_size, augment=False)
    val_max = max(10, int(args.max_images * 0.1)) if args.max_images else None

    if args.dataset_type == "hiertext":
        from ..data.hiertext import HierTextDetection as DS

        train_ds = DS(args.data_dir, train=True, transform=transform, max_images=args.max_images)
        val_ds = DS(args.data_dir, train=False, transform=val_transform, max_images=val_max)
    elif args.dataset_type == "ddi":
        from ..data.ddi100 import DDI100 as DS

        train_ds = DS(args.data_dir, train=True, transform=transform, max_images=args.max_images)
        val_ds = DS(args.data_dir, train=False, transform=val_transform, max_images=val_max)
    else:
        train_ds = SyntheticDetection(
            size=args.max_images or 64, page_size=cfg.mask_size, seed=seed,
            transform=transform,
        )
        val_ds = SyntheticDetection(
            size=val_max or 8, page_size=cfg.mask_size, seed=seed + 1,
            transform=val_transform,
        )

    mesh_cfg = MeshConfig()
    mesh = create_mesh(
        num_devices=args.num_devices or mesh_cfg.num_devices, axis=mesh_cfg.data_axis
    )
    collate = lambda s: collate_detection(  # noqa: E731
        s, batch_multiple=mesh.size * args.grad_accum
    )
    train_loader = DataLoader(
        train_ds, batch_size, collate, shuffle=True, seed=seed, num_threads=2
    )
    val_loader = DataLoader(val_ds, batch_size, collate)
    print(f"Training dataset: images {len(train_ds)} in {len(train_loader)} batches")
    print(f"Validation dataset: images {len(val_ds)} in {len(val_loader)} batches")

    mcfg = DetectionModelConfig()
    model = DetectionModel(
        depth_scale=mcfg.depth_scale,
        dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
    )
    state = create_train_state(model, jax.random.key(seed), jnp.zeros((1, 64, 64, 1)))
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(state.params))
    print(f"Model param count: {n_params}")

    epoch = 0
    if args.checkpoint:
        state, epoch = load_checkpoint(args.checkpoint, state)
    state = replicate_tree(state, mesh)

    if args.export:
        from .export_utils import export_weights

        export_weights(state, args.export, model="detection", epoch=epoch)
        return

    # Collation pads every batch to a multiple of mesh.size * grad_accum
    # (zero-weight rows), so any --batch-size is valid.
    train_step, eval_step = make_detection_steps(
        model, grad_accum=args.grad_accum
    )

    if args.validate_only:
        if not args.checkpoint:
            parser.exit(1, "--validate-only requires --checkpoint\n")
        val_loss, val_metrics = run_eval_epoch(
            val_loader, mesh, state, eval_step, debug_images=args.debug_images
        )
        print(f"Validation loss {val_loss:.4f}")
        print("Validation metrics:", format_metrics(val_metrics))
        return

    logger = MetricsLogger(
        "text-detection",
        config={
            "batch_size": batch_size,
            "dataset_size": len(train_ds),
            "model_params": n_params,
            "seed": seed,
            "mesh_devices": mesh.size,
        },
    )

    lr = args.lr or cfg.learning_rate
    min_train_loss = 1.0
    epochs_without_improvement = 0
    while args.max_epochs is None or epoch < args.max_epochs:
        state, train_loss, train_stats = run_train_epoch(
            train_loader, mesh, state, train_step, lr, debug_images=args.debug_images
        )
        val_loss, val_metrics = run_eval_epoch(
            val_loader, mesh, state, eval_step, debug_images=args.debug_images
        )
        print(f"Epoch {epoch} train loss {train_loss:.4f} validation loss {val_loss:.4f}")
        print(f"Epoch {epoch} validation metrics:", format_metrics(val_metrics))
        logger.log(
            {
                "train_loss": train_loss,
                "val_loss": val_loss,
                "val_metrics": val_metrics,
                **train_stats,
            },
            step=epoch,
        )

        if train_loss < min_train_loss:
            min_train_loss = train_loss
            epochs_without_improvement = 0
            save_checkpoint(cfg.checkpoint_name, state, epoch)
        else:
            epochs_without_improvement += 1
        if epochs_without_improvement > cfg.early_stop_epochs:
            print(
                f"Stopping after {epochs_without_improvement} epochs "
                "without train loss improvement"
            )
            break
        epoch += 1


if __name__ == "__main__":
    main()
