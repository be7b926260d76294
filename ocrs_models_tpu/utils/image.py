"""Image normalization helpers.

Pixel convention matches the reference (datasets/util.py:27-45): models
consume float images with values in [-0.5, 0.5], where -0.5 is black.
Arrays are HWC (trailing channel) — the TPU-native layout — rather than the
reference's CHW.
"""

from __future__ import annotations

import numpy as np


def transform_image(img: np.ndarray) -> np.ndarray:
    """uint8 image -> float32 in [-0.5, 0.5]."""
    return img.astype(np.float32) / 255.0 - 0.5


def untransform_image(img: np.ndarray) -> np.ndarray:
    """float image in [-0.5, 0.5] -> uint8 in [0, 255]."""
    return np.clip((np.asarray(img) + 0.5) * 255.0, 0, 255).astype(np.uint8)
