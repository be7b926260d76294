"""Checkpoint conversion CLI — the migration entry point.

Two subcommands close the loop between the reference's torch checkpoints
(published on Hugging Face, reference README.md:28-32) and this
framework's Orbax checkpoint directories:

- ``import-pt``: reference-format ``.pt`` (``{epoch, model_state,
  optimizer_state}`` as written by the reference's save_checkpoint,
  train_detection.py:198-206 — or a bare ``state_dict``) -> an Orbax
  checkpoint directory that every trainer ``--checkpoint`` flag and eval
  CLI accepts. Zero-retrain migration: weights are mapped with exact
  numerics (export/torch_import.py); optimizer state starts fresh (the
  reference's Adam moments are laid out per-torch-tensor and are not
  meaningful to optax).
- ``convert``: an Orbax checkpoint directory -> ``.npz`` (flat numpy
  archive), ``.pt`` (reference-format torch checkpoint — feed it to the
  reference's own ``--export`` for its ONNX/rten path), or ``.onnx``
  (direct first-party emission with the reference's io names, dynamic
  axes, and opset 16).

Examples::

    python -m ocrs_models_tpu.export import-pt recognition \
        text-recognition-checkpoint.pt text-rec-checkpoint/
    python -m ocrs_models_tpu.training.train_rec hiertext DATA \
        --checkpoint text-rec-checkpoint/          # resume from it
    python -m ocrs_models_tpu.export convert recognition \
        text-rec-checkpoint/ text-recognition.onnx

Runs on the host CPU backend: conversion is IO-bound and must work on
machines without a TPU attached.
"""

from __future__ import annotations

import argparse
import sys


def _model_and_input(kind: str):
    import jax.numpy as jnp

    from ..config import DEFAULT_ALPHABET
    from ..models import DetectionModel, LayoutModel, RecognitionModel

    if kind == "detection":
        return DetectionModel(), jnp.zeros((1, 128, 128, 1)), None
    if kind == "recognition":
        model = RecognitionModel(n_classes=len(DEFAULT_ALPHABET) + 1)
        return model, jnp.zeros((1, 64, 64, 1)), 4.0  # trainer's grad clip
    return LayoutModel(), jnp.zeros((1, 32, 4)), None


def _fresh_state(kind: str):
    import jax

    from ..training.state import create_train_state

    model, example, clip = _model_and_input(kind)
    return create_train_state(
        model, jax.random.key(0), example, grad_clip_norm=clip
    )


def _load_reference_pt(path: str):
    """Read a reference-format .pt; returns (state_dict, epoch)."""
    import torch

    payload = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(payload, dict) and "model_state" in payload:
        return payload["model_state"], int(payload.get("epoch", 0))
    return payload, 0  # bare state_dict


def cmd_import_pt(args) -> int:
    from ..utils.checkpoint import save_checkpoint
    from . import (
        import_detection_state_dict,
        import_layout_state_dict,
        import_recognition_state_dict,
    )

    sd, epoch = _load_reference_pt(args.pt_file)
    importer = {
        "detection": import_detection_state_dict,
        "recognition": import_recognition_state_dict,
        "layout": import_layout_state_dict,
    }[args.model]
    variables = importer(sd)
    state = _fresh_state(args.model)
    # Template init + replace keeps optimizer state/step consistent with
    # the imported param tree; a structure/shape mismatch fails loudly
    # here rather than corrupting a checkpoint directory.
    import jax

    t_flat, t_def = jax.tree_util.tree_flatten(state.params)
    i_flat, i_def = jax.tree_util.tree_flatten(variables["params"])
    if t_def != i_def:
        raise ValueError(
            f"imported param tree does not match the {args.model} model:\n"
            f"  model:    {t_def}\n  imported: {i_def}"
        )
    for a, b in zip(t_flat, i_flat):
        if a.shape != b.shape:
            raise ValueError(
                f"imported param shape mismatch: {b.shape} vs model {a.shape}"
            )
    state = state.replace(
        params=variables["params"],
        batch_stats=variables.get("batch_stats", state.batch_stats),
    )
    out = save_checkpoint(args.out_dir, state, epoch=epoch)
    print(
        f"Imported {args.model} weights from {args.pt_file} (epoch {epoch}) "
        f"-> {out}"
    )
    return 0


def cmd_convert(args) -> int:
    from ..training.export_utils import export_weights
    from ..utils.checkpoint import load_checkpoint

    state = _fresh_state(args.model)
    state, epoch = load_checkpoint(args.ckpt_dir, state)
    export_weights(state, args.out_file, model=args.model, epoch=epoch)
    return 0


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(
        prog="python -m ocrs_models_tpu.export",
        description=__doc__.split("\n\n")[0],
    )
    sub = parser.add_subparsers(dest="cmd", required=True)

    p_imp = sub.add_parser(
        "import-pt",
        help="reference .pt checkpoint -> Orbax checkpoint directory",
    )
    p_imp.add_argument("model", choices=["detection", "recognition", "layout"])
    p_imp.add_argument("pt_file")
    p_imp.add_argument("out_dir")
    p_imp.set_defaults(fn=cmd_import_pt)

    p_conv = sub.add_parser(
        "convert",
        help="Orbax checkpoint directory -> .npz / .pt / .onnx",
    )
    p_conv.add_argument("model", choices=["detection", "recognition", "layout"])
    p_conv.add_argument("ckpt_dir")
    p_conv.add_argument("out_file")
    p_conv.set_defaults(fn=cmd_convert)

    args = parser.parse_args(argv)

    # Pin to the host CPU backend before any jax backend init (the env
    # var is overridden by this image's sitecustomize; the config update
    # is authoritative). Conversion must not require a live TPU.
    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
