"""Smoke test for the env-gated one-command ``tools/parity_eval.py``.

The real use is ``--torch-checkpoint`` style runs against the published
HuggingFace checkpoints (BASELINE.json north star), which this sandbox
cannot download. This test keeps the command from rotting (round-4
verdict item 8): it builds reference-format ``.pt`` stand-ins from
random-init torch reference models and runs the CLI end-to-end,
asserting the import + cross-framework comparison machinery reports
tight forward deltas.
"""

import json
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REFERENCE_PATH = "/root/reference"
if REFERENCE_PATH not in sys.path:
    sys.path.insert(0, REFERENCE_PATH)

ref_models = pytest.importorskip(
    "ocrs_models.models", reason="reference repo not mounted"
)

ALPHABET_96 = "".join(chr(33 + i) for i in range(94)) + " €"


@pytest.fixture()
def checkpoints(tmp_path):
    torch.manual_seed(0)
    rec = ref_models.RecognitionModel(alphabet=ALPHABET_96)
    det = ref_models.DetectionModel()
    rec_pt = tmp_path / "text-rec.pt"
    det_pt = tmp_path / "text-detection.pt"
    # The reference's save_checkpoint format (train.py): model_state + epoch.
    torch.save({"epoch": 1, "model_state": rec.state_dict()}, rec_pt)
    torch.save({"epoch": 1, "model_state": det.state_dict()}, det_pt)
    return str(rec_pt), str(det_pt)


def test_parity_eval_cli_smoke(checkpoints, tmp_path, monkeypatch, capsys):
    rec_pt, det_pt = checkpoints
    sys.path.insert(0, "/root/repo/tools")
    try:
        import parity_eval
    finally:
        sys.path.remove("/root/repo/tools")

    monkeypatch.setattr(
        sys,
        "argv",
        [
            "parity_eval.py",
            "--rec", rec_pt,
            "--det", det_pt,
            "--samples", "1",
            "--det-size", "64x64",
        ],
    )
    parity_eval.main()
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    assert report["rec_output_shape"] == [1, 65, 97]
    assert report["det_output_shape"] == [1, 64, 64, 1]
    # Random-init forward parity: same gate as test_torch_import, looser
    # tolerance because this goes through the full CLI (float32 end to end).
    assert report["rec_max_abs_delta"] <= 1e-3
    assert report["rec_argmax_agreement"] >= 0.99
    assert report["det_max_abs_delta"] <= 1e-3
    assert report["det_mask_iou"] >= 0.99
    assert not np.isnan(report["rec_max_abs_delta"])
