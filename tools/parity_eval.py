"""Checkpoint parity evaluation against the reference implementation.

Given a reference-format torch checkpoint (``{epoch, model_state, ...}`` as
produced by the reference's save_checkpoint or this framework's ``--export
foo.pt``), this tool imports the weights into the Flax models and reports
forward-output deltas against the torch reference models on identical
inputs — the measurement behind the <=1% CER/IoU parity gate
(BASELINE.json). With the published ocrs Hugging Face checkpoints on disk,
point --det/--rec at them.

Usage:
    PYTHONPATH=/root/repo:/root/reference python tools/parity_eval.py \
        --rec text-rec.pt [--det text-detection.pt] [--samples 8]
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--det", type=str, help="reference detection checkpoint (.pt)")
    ap.add_argument("--rec", type=str, help="reference recognition checkpoint (.pt)")
    ap.add_argument("--samples", type=int, default=4)
    ap.add_argument(
        "--det-size",
        type=str,
        default="800x600",
        help="detection input HxW; default = the full trained page shape "
        "(reference train_detection.py:22-24)",
    )
    args = ap.parse_args()
    if not (args.det or args.rec):
        ap.error("provide --det and/or --rec")

    import torch

    import jax.numpy as jnp

    from ocrs_models_tpu.export import (
        import_detection_state_dict,
        import_recognition_state_dict,
    )
    from ocrs_models_tpu.models import DetectionModel, RecognitionModel

    try:
        from ocrs_models.models import DetectionModel as TorchDet
        from ocrs_models.models import RecognitionModel as TorchRec
    except ImportError:
        print(
            "reference package not importable; add /root/reference to "
            "PYTHONPATH for torch-side comparison",
            file=sys.stderr,
        )
        TorchDet = TorchRec = None

    rng = np.random.default_rng(0)
    report = {}

    if args.rec:
        ckpt = torch.load(args.rec, map_location="cpu", weights_only=True)
        sd = ckpt["model_state"] if "model_state" in ckpt else ckpt
        variables = import_recognition_state_dict(sd)
        model = RecognitionModel(n_classes=sd["output.0.bias"].shape[0])
        x = rng.uniform(-0.5, 0.5, (args.samples, 64, 256, 1)).astype(np.float32)
        ours = np.asarray(model.apply(variables, jnp.array(x), train=False))
        report["rec_output_shape"] = list(ours.shape)
        if TorchRec is not None:
            n_cls = sd["output.0.bias"].shape[0]
            tm = TorchRec(alphabet="x" * (n_cls - 1))
            tm.eval()
            tm.load_state_dict(sd)
            with torch.no_grad():
                theirs = tm(torch.tensor(x.transpose(0, 3, 1, 2))).numpy()
            theirs = theirs.transpose(1, 0, 2)
            report["rec_max_abs_delta"] = float(np.abs(ours - theirs).max())
            report["rec_argmax_agreement"] = float(
                (ours.argmax(-1) == theirs.argmax(-1)).mean()
            )

    if args.det:
        ckpt = torch.load(args.det, map_location="cpu", weights_only=True)
        sd = ckpt["model_state"] if "model_state" in ckpt else ckpt
        variables = import_detection_state_dict(sd)
        model = DetectionModel()
        h, w = (int(v) for v in args.det_size.split("x"))
        x = rng.uniform(-0.5, 0.5, (1, h, w, 1)).astype(np.float32)
        ours = np.asarray(model.apply(variables, jnp.array(x), train=False))
        report["det_output_shape"] = list(ours.shape)
        if TorchDet is not None:
            tm = TorchDet()
            tm.eval()
            tm.load_state_dict(sd)
            with torch.no_grad():
                theirs = tm(torch.tensor(x.transpose(0, 3, 1, 2))).numpy()
            theirs = theirs.transpose(0, 2, 3, 1)
            report["det_max_abs_delta"] = float(np.abs(ours - theirs).max())
            # Mask IoU at the standard 0.5 threshold.
            a = ours > 0.5
            b = theirs > 0.5
            union = np.logical_or(a, b).sum()
            report["det_mask_iou"] = float(
                np.logical_and(a, b).sum() / union if union else 1.0
            )

    print(json.dumps(report))


if __name__ == "__main__":
    main()
