import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ocrs_models_tpu.config import DEFAULT_ALPHABET
from ocrs_models_tpu.models import DetectionModel, LayoutModel, RecognitionModel


def n_params(params) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))


class TestDetectionModel:
    @pytest.fixture(scope="class")
    def model_and_vars(self):
        model = DetectionModel()
        x = jnp.zeros((1, 64, 48, 1))
        variables = model.init(jax.random.key(0), x, train=False)
        return model, variables

    def test_param_count_matches_reference(self, model_and_vars):
        # Reference DetectionModel has 622,122 trainable params
        # (verified by executing /root/reference/ocrs_models/models.py:93-143).
        _, variables = model_and_vars
        assert n_params(variables["params"]) == 622_122

    def test_output_shape_and_range(self, model_and_vars):
        model, variables = model_and_vars
        x = jnp.ones((2, 64, 48, 1)) * 0.25
        y = model.apply(variables, x, train=False)
        assert y.shape == (2, 64, 48, 1)
        assert float(y.min()) >= 0.0 and float(y.max()) <= 1.0

    def test_odd_size_input(self, model_and_vars):
        # 800x600 -> pyramid with odd dims (25x18 -> 12x9); check a smaller
        # odd-surviving size round-trips to the input resolution.
        model, variables = model_and_vars
        x = jnp.zeros((1, 200, 150, 1))
        y = model.apply(variables, x, train=False)
        assert y.shape == (1, 200, 150, 1)

    def test_train_mode_updates_batch_stats(self, model_and_vars):
        model, variables = model_and_vars
        x = jnp.ones((1, 64, 48, 1)) * 0.3
        _, mutated = model.apply(
            variables, x, train=True, mutable=["batch_stats"]
        )
        old = jax.tree.leaves(variables["batch_stats"])
        new = jax.tree.leaves(mutated["batch_stats"])
        assert any(not np.allclose(o, n) for o, n in zip(old, new))


class TestRecognitionModel:
    @pytest.fixture(scope="class")
    def model_and_vars(self):
        model = RecognitionModel(n_classes=len(DEFAULT_ALPHABET) + 1)
        x = jnp.zeros((1, 64, 128, 1))
        variables = model.init(jax.random.key(0), x, train=False)
        return model, variables

    def test_param_count_matches_reference(self, model_and_vars):
        # Reference RecognitionModel has 2,426,913 trainable params.
        _, variables = model_and_vars
        assert n_params(variables["params"]) == 2_426_913

    def test_output_shape_has_w4_plus_1_timesteps(self, model_and_vars):
        model, variables = model_and_vars
        for w in (64, 128, 252):
            x = jnp.zeros((2, 64, w, 1))
            y = model.apply(variables, x, train=False)
            assert y.shape == (2, w // 4 + 1, 97), f"W={w}"

    def test_output_is_log_softmax(self, model_and_vars):
        model, variables = model_and_vars
        x = jax.random.uniform(jax.random.key(1), (1, 64, 64, 1), minval=-0.5, maxval=0.5)
        y = model.apply(variables, x, train=False)
        sums = jnp.exp(y).sum(axis=-1)
        np.testing.assert_allclose(np.asarray(sums), 1.0, rtol=1e-5)


class TestLayoutModel:
    @pytest.fixture(scope="class")
    def model_and_vars(self):
        model = LayoutModel()
        x = jnp.zeros((1, 16, 4))
        variables = model.init(jax.random.key(0), x, train=False)
        return model, variables

    def test_param_count_matches_reference(self, model_and_vars):
        # Reference LayoutModel (sin embedding) has 4,739,074 trainable params.
        _, variables = model_and_vars
        assert n_params(variables["params"]) == 4_739_074

    def test_output_shape(self, model_and_vars):
        model, variables = model_and_vars
        x = jnp.ones((3, 20, 4)) * 100.0
        y = model.apply(variables, x, train=False)
        assert y.shape == (3, 20, 2)

    def test_return_probs(self):
        model = LayoutModel(return_probs=True)
        x = jnp.ones((1, 8, 4)) * 50.0
        variables = model.init(jax.random.key(0), x, train=False)
        y = model.apply(variables, x, train=False)
        assert float(y.min()) >= 0.0 and float(y.max()) <= 1.0


class TestSinusoidalEncoding:
    def test_matches_reference_formula(self):
        from ocrs_models_tpu.models.layout import sinusoidal_bbox_encoding

        # Reference builds a table positional_encoding(max_coord+1, size) and
        # gathers rows by rounded coordinate (models.py:271-318). Rebuild that
        # table here and compare.
        size = 64
        depth = size // 2
        boxes = np.array([[[3.0, 10.0, 250.0, 17.4]]], dtype=np.float32)
        enc = np.asarray(sinusoidal_bbox_encoding(jnp.array(boxes), size))

        positions = np.arange(256)[:, None]
        depths = np.arange(depth)[None, :] / depth
        angle_rads = positions / (10_000.0**depths)
        table = np.concatenate([np.sin(angle_rads), np.cos(angle_rads)], axis=-1)
        expect = table[np.round(boxes[0, 0]).astype(int)].reshape(1, 1, -1)
        np.testing.assert_allclose(enc, expect, rtol=1e-4, atol=1e-5)
