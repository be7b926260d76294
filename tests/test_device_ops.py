"""Device-side preprocessing and postprocessing passes."""

import jax
import jax.numpy as jnp
import numpy as np

from ocrs_models_tpu.data.device_pipeline import (
    batch_resize,
    normalize_uint8,
    photometric_augment,
)
from ocrs_models_tpu.geometry import connected_components
from ocrs_models_tpu.geometry.device import (
    component_bounds_device,
    connected_components_device,
)


class TestDevicePreprocess:
    def test_normalize(self):
        x = jnp.array([[[[0], [255]], [[128], [64]]]], dtype=jnp.uint8)
        y = np.asarray(normalize_uint8(x))
        # XLA lowers /255 to a reciprocal multiply: exact to ~1e-7.
        np.testing.assert_allclose(y.min(), -0.5, atol=1e-6)
        np.testing.assert_allclose(y.max(), 0.5, atol=1e-6)

    def test_resize_shapes(self):
        x = jnp.zeros((3, 32, 100, 1))
        y = batch_resize(x, 64, 200)
        assert y.shape == (3, 64, 200, 1)

    def test_photometric_augment_bounds_and_partial_apply(self):
        rng = np.random.default_rng(0)
        x = jnp.array(rng.uniform(-0.5, 0.5, (16, 8, 8, 1)).astype(np.float32))
        y = photometric_augment(x, jax.random.key(1))
        y = np.asarray(y)
        assert y.min() >= -0.5 - 1e-6 and y.max() <= 0.5 + 1e-6
        changed = [not np.allclose(y[i], np.asarray(x[i])) for i in range(16)]
        # p=0.5 per sample: some change, some don't.
        assert any(changed) and not all(changed)


class TestDevicePostprocess:
    def _partition_equal(self, dev_labels, host_labels):
        mapping = {}
        for d, h in zip(dev_labels.ravel().tolist(), host_labels.ravel().tolist()):
            if (d == 0) != (h == 0):
                return False
            if d == 0:
                continue
            if mapping.setdefault(d, h) != h:
                return False
        return True

    def test_matches_host_cc(self):
        rng = np.random.default_rng(1)
        masks = (rng.uniform(size=(2, 24, 32)) > 0.72).astype(np.uint8)
        dev = np.asarray(connected_components_device(jnp.array(masks)))
        for i in range(2):
            host_labels, n = connected_components(masks[i])
            assert self._partition_equal(dev[i], host_labels)
            assert len(np.unique(dev[i][dev[i] > 0])) == n

    def test_component_bounds(self):
        mask = np.zeros((1, 20, 30), np.uint8)
        mask[0, 2:6, 3:10] = 1
        mask[0, 10:15, 20:28] = 1
        labels = connected_components_device(jnp.array(mask))
        boxes, valid = component_bounds_device(labels, max_components=4)
        boxes = np.asarray(boxes[0])
        valid = np.asarray(valid[0])
        assert valid.sum() == 2
        got = {tuple(b) for b, v in zip(boxes.tolist(), valid.tolist()) if v}
        assert (3, 2, 9, 5) in got
        assert (20, 10, 27, 14) in got

    def test_empty_mask(self):
        labels = connected_components_device(jnp.zeros((1, 8, 8)))
        assert int(jnp.max(labels)) == 0
        boxes, valid = component_bounds_device(labels, max_components=3)
        assert not bool(np.asarray(valid).any())
