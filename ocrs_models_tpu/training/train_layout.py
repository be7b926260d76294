"""Text layout trainer CLI.

Capability parity with the reference's ``python -m ocrs_models.train_layout``
(train_layout.py): WebLayout JSON (or synthetic), weighted BCE (pos_weight
10), Adam(3e-4) with 50-epoch linear warmup, per-class precision/recall,
checkpoint on best validation loss.

Usage:
    python -m ocrs_models_tpu.training.train_layout <data_dir>
    python -m ocrs_models_tpu.training.train_layout synthetic --max-epochs 2
"""

from __future__ import annotations

from argparse import ArgumentParser, BooleanOptionalAction

import jax
import jax.numpy as jnp
import numpy as np

from ..config import LayoutModelConfig, LayoutTrainConfig, MeshConfig
from ..data import DataLoader, SyntheticLayout, collate_layout
from ..models import LayoutModel
from ..parallel import create_mesh, replicate_tree, shard_batch
from ..utils.checkpoint import load_checkpoint, save_checkpoint
from ..utils.logging import MetricsLogger
from ..utils.metrics import LayoutAccuracyStats
from .schedules import LinearWarmup
from .state import create_train_state
from .steps import make_layout_steps


def run_epoch(loader, mesh, state, step_fn, lr=None, rng=None, train=True):
    stats = LayoutAccuracyStats()
    total_loss, n_batches = 0.0, 0
    for batch in loader:
        n_valid = batch.pop("n_valid", len(batch["boxes"]))
        sharded = shard_batch(batch, mesh)
        if train:
            rng, step_rng = jax.random.split(rng)
            state, metrics = step_fn(state, sharded, jnp.float32(lr), step_rng)
        else:
            metrics = step_fn(state, sharded)
        total_loss += float(metrics["loss"])
        n_batches += 1
        stats.update(np.asarray(metrics["probs"])[:n_valid], batch["labels"][:n_valid])
    mean_loss = total_loss / max(n_batches, 1)
    if train:
        return state, rng, mean_loss, stats
    return mean_loss, stats


def main(argv=None):
    parser = ArgumentParser(description="Train text layout model.")
    parser.add_argument(
        "data_dir",
        help="WebLayout JSON dir, 'synthetic' (flat lines), or "
        "'synthetic-doc' (structured-document generator)",
    )
    parser.add_argument("--checkpoint", type=str)
    parser.add_argument("--export", type=str)
    parser.add_argument("--max-epochs", type=int)
    parser.add_argument("--max-images", type=int)
    parser.add_argument("--validate-only", action="store_true")
    parser.add_argument("--batch-size", type=int, default=None)
    parser.add_argument("--num-devices", type=int, default=None)
    parser.add_argument(
        "--grad-accum", type=int, default=1,
        help="Microbatches per optimizer step (lax.scan inside the jitted step)",
    )
    parser.add_argument(
        "--bf16", default=True, action=BooleanOptionalAction,
        help="bfloat16 encoder matmuls (norms/softmax stay fp32)",
    )
    args = parser.parse_args(argv)

    # Fail fast (with a diagnostic) instead of hanging if the TPU runtime
    # is wedged — a bounded subprocess probe, see utils/backend.py.
    from ..utils.backend import ensure_backend

    ensure_backend()

    cfg = LayoutTrainConfig()
    batch_size = args.batch_size or cfg.batch_size
    seed = cfg.seed

    if args.data_dir == "synthetic":
        train_ds = SyntheticLayout(size=args.max_images or 128, n_words=cfg.n_words, seed=seed)
        val_ds = SyntheticLayout(size=32, n_words=cfg.n_words, seed=seed + 1)
    elif args.data_dir == "synthetic-doc":
        # First-party structured-document generator (the browser-scraper
        # replacement, data/layout_synth.py): realistic multi-column pages
        # with word-wrap, headings, lists — raw pixel coords + jitter like
        # the web-layout path.
        from ..data.layout_synth import SyntheticDocLayout

        train_ds = SyntheticDocLayout(
            size=args.max_images or 256, n_words=cfg.n_words, seed=seed,
            train=True, normalize_coords=False, randomize=True,
            max_jitter=cfg.max_jitter,
        )
        val_ds = SyntheticDocLayout(
            size=max(32, (args.max_images or 256) // 8), n_words=cfg.n_words,
            seed=seed, train=False, normalize_coords=False,
        )
    else:
        from ..data.web_layout import WebLayout

        train_ds = WebLayout(
            args.data_dir, max_jitter=cfg.max_jitter, normalize_coords=False,
            randomize=True, padded_size=cfg.n_words, train=True,
            max_images=args.max_images, seed=seed,
        )
        val_ds = WebLayout(
            args.data_dir, normalize_coords=False, randomize=False,
            padded_size=cfg.n_words, train=False,
        )

    mesh_cfg = MeshConfig()
    mesh = create_mesh(
        num_devices=args.num_devices or mesh_cfg.num_devices, axis=mesh_cfg.data_axis
    )
    collate = lambda s: collate_layout(  # noqa: E731
        s, batch_multiple=mesh.size * args.grad_accum
    )
    train_loader = DataLoader(train_ds, batch_size, collate, shuffle=True, seed=seed)
    val_loader = DataLoader(val_ds, batch_size, collate, shuffle=True, seed=seed)

    mcfg = LayoutModelConfig()
    model = LayoutModel(
        n_classes=mcfg.n_classes,
        d_model=mcfg.d_model,
        n_layers=mcfg.n_layers,
        n_heads=mcfg.n_heads,
        d_ff=mcfg.d_feedforward,
        pos_embedding=mcfg.pos_embedding,
        dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
    )
    state = create_train_state(model, jax.random.key(seed), jnp.zeros((1, 8, 4)))
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(state.params))
    print(f"Model param count {n_params}")

    epoch = 0
    if args.checkpoint:
        state, epoch = load_checkpoint(args.checkpoint, state)
    state = replicate_tree(state, mesh)

    if args.export:
        from .export_utils import export_weights

        export_weights(state, args.export, model="layout", epoch=epoch)
        return

    # Collation pads every batch to a multiple of mesh.size * grad_accum
    # (zero-weight rows), so any --batch-size is valid.
    train_step, eval_step = make_layout_steps(
        model, pos_weight=cfg.pos_weight, grad_accum=args.grad_accum
    )

    if args.validate_only:
        val_loss, val_stats = run_epoch(
            val_loader, mesh, state, eval_step, train=False
        )
        print(f"Epoch {epoch} val stats: {val_stats.summary()}")
        return

    logger = MetricsLogger(
        "text-layout",
        config={
            "dataset_size": len(train_ds),
            "model_params": n_params,
            "seed": seed,
            "mesh_devices": mesh.size,
        },
    )
    warmup = LinearWarmup(cfg.learning_rate, cfg.warmup_epochs)
    rng = jax.random.key(seed)
    best_val_loss = float("inf")

    while args.max_epochs is None or epoch < args.max_epochs:
        lr = warmup.at_epoch(epoch)
        state, rng, train_loss, train_stats = run_epoch(
            train_loader, mesh, state, train_step, lr=lr, rng=rng, train=True
        )
        val_loss, val_stats = run_epoch(val_loader, mesh, state, eval_step, train=False)

        print(f"Epoch {epoch} train loss {train_loss} val loss {val_loss}")
        print(f"Epoch {epoch} train stats: {train_stats.summary()}")
        print(f"Epoch {epoch} val stats: {val_stats.summary()}")
        print(f"Epoch {epoch} lr {lr}")
        logger.log(
            {
                "lr": lr,
                "train_loss": train_loss,
                "train_accuracy": train_stats.stats_dict(),
                "val_loss": val_loss,
                "val_accuracy": val_stats.stats_dict(),
            },
            step=epoch,
        )
        if val_loss < best_val_loss:
            best_val_loss = val_loss
            save_checkpoint(cfg.checkpoint_name, state, epoch)
        epoch += 1


if __name__ == "__main__":
    main()
