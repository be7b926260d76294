"""Numerical parity of the Flax models against the reference PyTorch models.

The reference implementation at /root/reference is imported *as a test
oracle only* (never vendored): random-init torch models are exported via
``state_dict()``, imported through ``ocrs_models_tpu.export``, and both
sides are run on the same inputs. This is the same gate that validates
published-checkpoint imports.
"""

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

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from ocrs_models_tpu.export import (  # noqa: E402
    import_detection_state_dict,
    import_layout_state_dict,
    import_recognition_state_dict,
)
from ocrs_models_tpu.models import (  # noqa: E402
    DetectionModel,
    LayoutModel,
    RecognitionModel,
)

ALPHABET_96 = "".join(chr(33 + i) for i in range(94)) + " €"


@pytest.fixture(scope="module")
def rng():
    torch.manual_seed(0)
    return np.random.default_rng(0)


class TestDetectionParity:
    @pytest.mark.parametrize("train_mode", [False, True])
    def test_forward_parity(self, rng, train_mode):
        tm = ref_models.DetectionModel()
        tm.train(train_mode)
        variables = import_detection_state_dict(tm.state_dict())

        x = rng.uniform(-0.5, 0.5, size=(1, 128, 96, 1)).astype(np.float32)
        x_t = torch.tensor(x.transpose(0, 3, 1, 2))

        if train_mode:
            ours, _ = DetectionModel().apply(
                variables, jnp.array(x), train=True, mutable=["batch_stats"]
            )
            theirs = tm(x_t)  # train-mode BN uses batch stats
        else:
            ours = DetectionModel().apply(variables, jnp.array(x), train=False)
            with torch.no_grad():
                theirs = tm(x_t)
        theirs = theirs.detach().numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(np.asarray(ours), theirs, rtol=1e-3, atol=2e-5)

    @pytest.mark.slow
    def test_forward_parity_full_resolution(self, rng):
        """Import parity at the FULL trained page shape, 800x600
        (reference train_detection.py:22-24: mask_height=800, width=600) —
        the shape published checkpoints were trained at and eval_detection
        runs at. Small-page parity does not imply full-res parity: the
        deeper pyramid levels (25x18, 12x9) and their ConvTranspose trim
        paths only materialize at real page sizes."""
        tm = ref_models.DetectionModel()
        tm.eval()
        variables = import_detection_state_dict(tm.state_dict())

        x = rng.uniform(-0.5, 0.5, size=(1, 800, 600, 1)).astype(np.float32)
        ours = DetectionModel().apply(variables, jnp.array(x), train=False)
        with torch.no_grad():
            theirs = tm(torch.tensor(x.transpose(0, 3, 1, 2)))
        theirs = theirs.detach().numpy().transpose(0, 2, 3, 1)
        assert ours.shape == theirs.shape == (1, 800, 600, 1)
        np.testing.assert_allclose(np.asarray(ours), theirs, rtol=1e-3, atol=2e-5)


class TestRecognitionParity:
    def test_forward_parity(self, rng):
        tm = ref_models.RecognitionModel(alphabet=ALPHABET_96)
        tm.eval()
        variables = import_recognition_state_dict(tm.state_dict())

        w = 96
        x = rng.uniform(-0.5, 0.5, size=(2, 64, w, 1)).astype(np.float32)
        x_t = torch.tensor(x.transpose(0, 3, 1, 2))

        model = RecognitionModel(n_classes=97)
        ours = np.asarray(model.apply(variables, jnp.array(x), train=False))
        with torch.no_grad():
            theirs = tm(x_t).numpy()  # [T, N, C]
        theirs = theirs.transpose(1, 0, 2)  # -> [N, T, C]
        assert ours.shape == theirs.shape == (2, w // 4 + 1, 97)
        np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=1e-4)


class TestLayoutParity:
    @pytest.mark.parametrize("pos_embedding", ["sin", "mlp"])
    def test_forward_parity(self, rng, pos_embedding):
        tm = ref_models.LayoutModel(return_probs=False, pos_embedding=pos_embedding)
        tm.eval()
        variables = import_layout_state_dict(
            tm.state_dict(), pos_embedding=pos_embedding
        )

        boxes = rng.uniform(0, 400, size=(2, 24, 4)).astype(np.float32)
        model = LayoutModel(pos_embedding=pos_embedding)
        ours = np.asarray(model.apply(variables, jnp.array(boxes), train=False))
        # Deliberate deviation from the reference: its encoder is fed
        # [N, W, d] but torch TransformerEncoder defaults to seq-first
        # [seq, batch, d], so the reference attends across the *batch* axis
        # (models.py:385-401 — a latent bug in the WIP layout model). This
        # framework attends over words within each sample; the torch oracle
        # is therefore fed word-first input to compute the same quantity.
        with torch.no_grad():
            theirs = (
                tm(torch.tensor(boxes.transpose(1, 0, 2)))
                .numpy()
                .transpose(1, 0, 2)
            )
        np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=1e-4)
