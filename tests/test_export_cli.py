"""`python -m ocrs_models_tpu.export` — the checkpoint-migration CLI.

Covers the two migration directions end to end on the CPU backend:
reference-format ``.pt`` -> Orbax checkpoint directory (``import-pt``,
zero-retrain migration from the reference's published checkpoints,
reference train_detection.py:198-215) and checkpoint directory ->
``.npz``/``.pt``/``.onnx`` (``convert``).
"""

import jax
import numpy as np
import pytest

from ocrs_models_tpu.export.__main__ import _fresh_state, main
from ocrs_models_tpu.training.export_utils import export_weights
from ocrs_models_tpu.utils.checkpoint import load_checkpoint, save_checkpoint


def _randomized(state, seed=0):
    """A state whose params/batch_stats are distinguishable from init."""
    rng = np.random.default_rng(seed)
    bump = lambda t: jax.tree.map(
        lambda a: np.asarray(a) + rng.normal(0, 0.05, a.shape).astype(a.dtype), t
    )
    return state.replace(params=bump(state.params), batch_stats=bump(state.batch_stats))


def _assert_trees_equal(a, b):
    flat_a = jax.tree_util.tree_leaves(a)
    flat_b = jax.tree_util.tree_leaves(b)
    assert len(flat_a) == len(flat_b)
    for x, y in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@pytest.mark.parametrize("model", ["detection", "layout"])
def test_import_pt_roundtrip(tmp_path, model):
    """export .pt (reference format) -> import-pt -> Orbax dir: weights and
    batch stats survive bit-exactly, and the epoch is carried over."""
    torch = pytest.importorskip("torch")
    del torch

    state = _randomized(_fresh_state(model))
    pt = tmp_path / "ref.pt"
    export_weights(state, str(pt), model=model, epoch=7)

    out_dir = tmp_path / "ckpt"
    assert main(["import-pt", model, str(pt), str(out_dir)]) == 0

    restored, epoch = load_checkpoint(str(out_dir), _fresh_state(model))
    assert epoch == 7
    _assert_trees_equal(restored.params, state.params)
    _assert_trees_equal(restored.batch_stats, state.batch_stats)


def test_import_pt_rejects_wrong_model(tmp_path):
    """Importing a detection checkpoint as layout must fail loudly (key or
    structure error), never write a checkpoint directory."""
    pytest.importorskip("torch")
    state = _fresh_state("detection")
    pt = tmp_path / "det.pt"
    export_weights(state, str(pt), model="detection", epoch=0)
    out_dir = tmp_path / "ckpt"
    with pytest.raises((KeyError, ValueError)):
        main(["import-pt", "layout", str(pt), str(out_dir)])
    assert not out_dir.exists()


@pytest.mark.parametrize("ext", ["npz", "onnx"])
def test_convert_from_checkpoint_dir(tmp_path, ext):
    state = _randomized(_fresh_state("layout"), seed=1)
    ckpt_dir = tmp_path / "ckpt"
    save_checkpoint(str(ckpt_dir), state, epoch=3)

    out = tmp_path / f"model.{ext}"
    assert main(["convert", "layout", str(ckpt_dir), str(out)]) == 0
    assert out.exists() and out.stat().st_size > 0
    if ext == "npz":
        flat = np.load(out)
        assert any(k.startswith("params/") for k in flat.files)
    else:
        # The emission is gated on export/onnx_check.py; spot-check the
        # wire format independently: field 1 (ir_version) varint header.
        data = out.read_bytes()
        assert data[0] == 0x08
