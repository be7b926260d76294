"""Host-side data augmentations.

Capability parity with the reference's torchvision pipelines:

- recognition (datasets/__init__.py:4-30): with p=0.5 apply one of
  {brightness/contrast jitter (0.1/0.1), rotation +-5 deg with expansion and
  bilinear resampling filled with black (-0.5), 5px padding filled with
  black}.
- detection (train_detection.py:266-290): with p=0.5 apply one of
  {brightness/contrast jitter, random affine (+-5 deg, scale 0.8-1.2,
  shear 5), random perspective (0.1), random 600px crop with padding},
  then resize to the training size — the same transform instance applied
  jointly to image and mask.

Implemented with PIL float ('F' mode) images + numpy, operating on
[-0.5, 0.5]-normalized arrays.
"""

from __future__ import annotations

import threading

import numpy as np
from PIL import Image

FILL = -0.5  # black for normalized images


def _to_pil(img: np.ndarray) -> Image.Image:
    return Image.fromarray(img[..., 0].astype(np.float32), mode="F")


def _from_pil(img: Image.Image) -> np.ndarray:
    return np.asarray(img, dtype=np.float32)[..., None]


def _color_jitter(rng: np.random.Generator, imgs: list[np.ndarray]) -> list[np.ndarray]:
    # Brightness/contrast in the [0, 1] domain, like torchvision on floats.
    b = rng.uniform(0.9, 1.1)
    c = rng.uniform(0.9, 1.1)
    out = []
    for i, img in enumerate(imgs):
        if i > 0:
            out.append(img)  # photometric noise never touches masks
            continue
        x = img + 0.5
        x = x * b
        mean = x.mean()
        x = (x - mean) * c + mean
        out.append(np.clip(x, 0.0, 1.0) - 0.5)
    return out


def _rotate_expand(rng: np.random.Generator, imgs, max_deg=5.0):
    angle = rng.uniform(-max_deg, max_deg)
    return [
        _from_pil(
            _to_pil(img).rotate(
                angle, resample=Image.BILINEAR, expand=True, fillcolor=FILL
            )
        )
        for img in imgs
    ]


def _pad(imgs, px=5):
    return [
        np.pad(img, ((px, px), (px, px), (0, 0)), constant_values=FILL)
        for img in imgs
    ]


def _affine(rng: np.random.Generator, imgs):
    h, w = imgs[0].shape[:2]
    angle = np.deg2rad(rng.uniform(-5, 5))
    scale = rng.uniform(0.8, 1.2)
    shear = np.deg2rad(rng.uniform(-5, 5))
    cx, cy = w / 2, h / 2
    # Inverse mapping (output -> input) around the image center.
    cos_a, sin_a = np.cos(angle), np.sin(angle)
    # forward: R(angle) @ Shear @ S(scale); invert analytically.
    fwd = np.array(
        [[cos_a, -sin_a], [sin_a, cos_a]]
    ) @ np.array([[1.0, np.tan(shear)], [0.0, 1.0]]) * scale
    inv = np.linalg.inv(fwd)
    a, b_, c_ = inv[0, 0], inv[0, 1], cx - inv[0, 0] * cx - inv[0, 1] * cy
    d, e, f = inv[1, 0], inv[1, 1], cy - inv[1, 0] * cx - inv[1, 1] * cy
    coeffs = (a, b_, c_, d, e, f)
    out = []
    for i, img in enumerate(imgs):
        resample = Image.BILINEAR if i == 0 else Image.NEAREST
        out.append(
            _from_pil(
                _to_pil(img).transform(
                    (w, h), Image.AFFINE, coeffs, resample=resample, fillcolor=FILL if i == 0 else 0.0
                )
            )
        )
    return out


def _perspective(rng: np.random.Generator, imgs, distortion=0.1):
    h, w = imgs[0].shape[:2]
    dx, dy = distortion * w / 2, distortion * h / 2
    src = np.float32([[0, 0], [w, 0], [w, h], [0, h]])
    dst = src + rng.uniform(-1, 1, size=(4, 2)) * [dx, dy]
    # Solve for PIL's 8 perspective coefficients mapping output -> input.
    mat = []
    vec = []
    for (xs, ys), (xd, yd) in zip(src, dst):
        mat.append([xd, yd, 1, 0, 0, 0, -xs * xd, -xs * yd])
        mat.append([0, 0, 0, xd, yd, 1, -ys * xd, -ys * yd])
        vec += [xs, ys]
    coeffs = np.linalg.solve(np.array(mat, dtype=np.float64), np.array(vec))
    out = []
    for i, img in enumerate(imgs):
        resample = Image.BILINEAR if i == 0 else Image.NEAREST
        out.append(
            _from_pil(
                _to_pil(img).transform(
                    (w, h),
                    Image.PERSPECTIVE,
                    tuple(coeffs),
                    resample=resample,
                    fillcolor=FILL if i == 0 else 0.0,
                )
            )
        )
    return out


def _random_crop(rng: np.random.Generator, imgs, size=600):
    h, w = imgs[0].shape[:2]
    pad_h, pad_w = max(0, size - h), max(0, size - w)
    if pad_h or pad_w:
        imgs = [
            np.pad(
                img,
                ((pad_h // 2, pad_h - pad_h // 2), (pad_w // 2, pad_w - pad_w // 2), (0, 0)),
                constant_values=FILL if i == 0 else 0.0,
            )
            for i, img in enumerate(imgs)
        ]
        h, w = imgs[0].shape[:2]
    y0 = int(rng.integers(0, h - size + 1))
    x0 = int(rng.integers(0, w - size + 1))
    return [img[y0 : y0 + size, x0 : x0 + size] for img in imgs]


def resize(img: np.ndarray, size: tuple[int, int], nearest=False) -> np.ndarray:
    """Resize HWC float image to (height, width)."""
    h, w = size
    if img.shape[:2] == (h, w):  # identity: skip the PIL round trip
        return np.ascontiguousarray(img, dtype=np.float32)
    pil = _to_pil(img).resize((w, h), Image.NEAREST if nearest else Image.BILINEAR)
    return _from_pil(pil)


class _PerCallRng:
    """Deterministic, thread-safe randomness source for augmentations.

    DataLoader fetches samples from a thread pool, so a single shared
    ``Generator`` would make augmentation order depend on thread scheduling
    (and Generators are not thread-safe). Each call derives a fresh
    Generator from ``(seed, index)`` when the dataset provides its sample
    index, or from ``(seed, call_counter)`` otherwise (thread-safe, though
    only index-keyed calls are reproducible under concurrency).
    """

    def __init__(self, seed: int):
        self.seed = seed
        self._counter = 0
        self._lock = threading.Lock()

    def get(self, idx=None) -> np.random.Generator:
        if idx is None:
            with self._lock:
                idx = 1_000_000_007 + self._counter
                self._counter += 1
        return np.random.default_rng((self.seed, int(idx)))


class RecognitionAugment:
    """Randomized line-crop augmentation (reference datasets/__init__.py:4-30)."""

    accepts_index = True  # datasets pass idx= for reproducible augmentation

    def __init__(self, seed: int = 0):
        self._rng_source = _PerCallRng(seed)

    def __call__(self, img: np.ndarray, idx=None) -> np.ndarray:
        rng = self._rng_source.get(idx)
        if rng.uniform() >= 0.5:
            return img
        choice = rng.integers(0, 3)
        if choice == 0:
            return _color_jitter(rng, [img])[0]
        if choice == 1:
            return _rotate_expand(rng, [img])[0]
        return _pad([img])[0]


class DetectionAugment:
    """Joint image+mask augmentation + resize (reference train_detection.py:
    266-290)."""

    accepts_index = True  # datasets pass idx= for reproducible augmentation

    def __init__(self, mask_size: tuple[int, int], augment: bool = True, seed: int = 0):
        self.mask_size = mask_size
        self.augment = augment
        self._rng_source = _PerCallRng(seed)

    def __call__(
        self, img: np.ndarray, mask: np.ndarray, idx=None
    ) -> tuple[np.ndarray, np.ndarray]:
        imgs = [img, mask]
        rng = self._rng_source.get(idx)
        if self.augment and rng.uniform() < 0.5:
            choice = rng.integers(0, 4)
            if choice == 0:
                imgs = _color_jitter(rng, imgs)
            elif choice == 1:
                imgs = _affine(rng, imgs)
            elif choice == 2:
                imgs = _perspective(rng, imgs)
            else:
                imgs = _random_crop(rng, imgs)
        img = resize(imgs[0], self.mask_size)
        mask = resize(imgs[1], self.mask_size)
        return img, mask
