"""Weight export entry point shared by the trainer CLIs.

The reference exports ONNX directly (train_*.py ``--export`` +
docs/training.md:138-154 for the .rten conversion). Here ``--export``
writes, by extension:

- ``.npz``: flat numpy archive of params (+ batch stats) — hermetic.
- ``.pt``: a reference-format torch checkpoint ``{epoch, model_state,
  optimizer_state}``; feed it to the reference's own ``--export`` to get
  ONNX/rten artifacts with exact numerics (requires torch).
- ``.onnx``: direct first-party ONNX emission (no ``onnx``/torch package
  needed) with the reference's input/output names, dynamic axes, and
  opset 16 (reference train_detection.py:398-405, train_rec.py:396-409,
  train_layout.py:255-269). See :mod:`ocrs_models_tpu.export.onnx_graph`.
"""

from __future__ import annotations

import jax
import numpy as np


def _flatten(tree, prefix=""):
    out = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = prefix + "/".join(str(getattr(p, "key", p)) for p in path)
        out[key] = np.asarray(leaf)
    return out


def export_weights(state, path: str, model: str, epoch: int = 0, **model_kwargs):
    variables = {
        "params": jax.tree.map(np.asarray, state.params),
        "batch_stats": jax.tree.map(np.asarray, state.batch_stats),
    }
    if path.endswith(".npz"):
        flat = {**_flatten(variables["params"], "params/")}
        if variables["batch_stats"]:
            flat.update(_flatten(variables["batch_stats"], "batch_stats/"))
        np.savez(path, **flat)
        print(f"Exported {len(flat)} arrays to {path}")
        return

    if path.endswith(".pt"):
        import torch

        from ..export import torch_export

        exporter = {
            "detection": torch_export.export_detection_state_dict,
            "recognition": torch_export.export_recognition_state_dict,
            "layout": torch_export.export_layout_state_dict,
        }[model]
        sd = {k: torch.tensor(v) for k, v in exporter(variables, **model_kwargs).items()}
        torch.save(
            {"epoch": epoch, "model_state": sd, "optimizer_state": {}}, path
        )
        print(f"Exported reference-format checkpoint to {path}")
        return

    if path.endswith(".onnx"):
        from ..export import onnx_graph, torch_export

        exporter = {
            "detection": torch_export.export_detection_state_dict,
            "recognition": torch_export.export_recognition_state_dict,
            "layout": torch_export.export_layout_state_dict,
        }[model]
        builder = {
            "detection": onnx_graph.build_detection_onnx,
            "recognition": onnx_graph.build_recognition_onnx,
            "layout": onnx_graph.build_layout_onnx,
        }[model]
        sd = exporter(variables)
        data = builder(sd, **model_kwargs)
        # Gate every emitted file on the independent spec checker
        # (export/onnx_check.py) so a convention bug can never ship.
        from ..export.onnx_check import check_bytes

        check_bytes(data)
        with open(path, "wb") as f:
            f.write(data)
        print(
            f"Exported ONNX model to {path} "
            "(first-party emission, opset 16, spec-checked)"
        )
        return
    raise ValueError(f"Unknown export format for {path} (use .npz, .pt or .onnx)")
