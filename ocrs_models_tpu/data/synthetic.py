"""Synthetic datasets: text-line crops, detection pages, layout boxes.

The reference has no equivalent — its only smoke-test affordance is
truncating HierText with ``--max-images`` (docs/training.md:86-93). These
generators make every trainer, test, and benchmark runnable end-to-end with
zero downloads, with the same sample contracts as the HierText pipelines.
"""

from __future__ import annotations

import numpy as np
from PIL import Image, ImageDraw, ImageFont

from ..config import DEFAULT_ALPHABET
from ..geometry import generate_mask
from ..utils.text import encode_text


def _default_font(size: int):
    try:
        return ImageFont.load_default(size=size)
    except TypeError:  # older Pillow: fixed-size bitmap font
        return ImageFont.load_default()


class SyntheticRecognition:
    """Random rendered text lines -> ``{"image": [64, W, 1], "text": [L]}``."""

    def __init__(
        self,
        size: int = 256,
        alphabet: str = DEFAULT_ALPHABET,
        output_height: int = 64,
        max_chars: int = 18,
        seed: int = 0,
        transform=None,
    ):
        self.size = size
        self.alphabet = alphabet
        self.output_height = output_height
        self.max_chars = max_chars
        self.seed = seed
        self.transform = transform
        self._font = _default_font(int(output_height * 0.6))

    def __len__(self):
        return self.size

    def __getitem__(self, idx: int) -> dict:
        rng = np.random.default_rng(self.seed * 100_003 + idx)
        n_chars = int(rng.integers(1, self.max_chars + 1))
        # Bias towards letters/digits for realistic lines.
        pool = self.alphabet[:11] + self.alphabet[44:] + " " * 4
        text = "".join(pool[i] for i in rng.integers(0, len(pool), n_chars)).strip()
        if not text:
            text = "a"

        h = self.output_height
        img = Image.new("L", (int(h * 0.6 * (len(text) + 2)), h), color=16)
        draw = ImageDraw.Draw(img)
        draw.text((h // 4, h // 8), text, fill=230, font=self._font)
        bbox = draw.textbbox((h // 4, h // 8), text, font=self._font)
        w = min(img.width, bbox[2] + h // 4)
        img = img.crop((0, 0, max(w, 10), h))

        arr = np.asarray(img, dtype=np.float32) / 255.0 - 0.5
        arr = arr[..., None]
        if self.transform is not None:
            if getattr(self.transform, "accepts_index", False):
                arr = self.transform(arr, idx=idx)
            else:
                arr = self.transform(arr)
            arr = np.clip(arr, -0.5, 0.5)
            # Re-normalize height after size-changing augmentations.
            if arr.shape[0] != h:
                from .augment import resize

                aspect = arr.shape[1] / arr.shape[0]
                new_w = min(800, max(10, int(h * aspect)))
                arr = resize(arr, (h, new_w))
        return {"image": arr.astype(np.float32), "text": encode_text(text, self.alphabet)}


class SyntheticDetection:
    """Random 'pages' of word-like boxes -> ``{"image", "mask"}`` pairs with
    the 3px-shrunk-polygon mask convention."""

    def __init__(
        self,
        size: int = 64,
        page_size: tuple[int, int] = (800, 600),
        seed: int = 0,
        transform=None,
        shrink_dist: float = 3.0,
    ):
        self.size = size
        self.page_size = page_size  # (H, W)
        self.seed = seed
        self.transform = transform
        self.shrink_dist = shrink_dist

    def __len__(self):
        return self.size

    def __getitem__(self, idx: int) -> dict:
        rng = np.random.default_rng(self.seed * 100_003 + idx)
        h, w = self.page_size
        img = np.full((h, w), 235, dtype=np.float32)
        img += rng.normal(0, 4, size=img.shape)
        polys = []
        n_lines = int(rng.integers(3, 10))
        y = 30.0
        for _ in range(n_lines):
            line_h = float(rng.uniform(14, 40))
            if y + line_h > h - 20:
                break
            x = 30.0
            n_words = int(rng.integers(2, 8))
            for _ in range(n_words):
                word_w = float(rng.uniform(25, 110))
                if x + word_w > w - 20:
                    break
                poly = [(x, y), (x + word_w, y), (x + word_w, y + line_h), (x, y + line_h)]
                polys.append(poly)
                img[int(y) : int(y + line_h), int(x) : int(x + word_w)] -= rng.uniform(
                    120, 200
                )
                x += word_w + float(rng.uniform(8, 25))
            y += line_h + float(rng.uniform(8, 30))

        image = (np.clip(img, 0, 255) / 255.0 - 0.5).astype(np.float32)[..., None]
        mask = generate_mask(w, h, polys, shrink_dist=self.shrink_dist)[..., None]
        if self.transform is not None:
            if getattr(self.transform, "accepts_index", False):
                image, mask = self.transform(image, mask, idx=idx)
            else:
                image, mask = self.transform(image, mask)
        return {"image": image, "mask": mask, "path": f"synthetic://{idx}"}


class SyntheticLayout:
    """Random word-box layouts with line-start/line-end labels derived from
    the vertical-overlap rule (reference web_layout.py:140-172)."""

    def __init__(self, size: int = 128, n_words: int = 500, seed: int = 0):
        self.size = size
        self.n_words = n_words
        self.seed = seed

    def __len__(self):
        return self.size

    def __getitem__(self, idx: int) -> tuple[np.ndarray, np.ndarray]:
        rng = np.random.default_rng(self.seed * 100_003 + idx)
        boxes, labels = [], []
        y = float(rng.uniform(10, 60))
        while y < 900 and len(boxes) < self.n_words:
            line_h = float(rng.uniform(12, 24))
            x = float(rng.uniform(10, 60))
            n = int(rng.integers(1, 12))
            for j in range(n):
                word_w = float(rng.uniform(20, 90))
                if x + word_w > 980:
                    break
                boxes.append([x, y, x + word_w, y + line_h])
                labels.append([0.0, 0.0])
                x += word_w + float(rng.uniform(4, 14))
            y += line_h + float(rng.uniform(4, 20))

        # Derive labels from vertical overlap of adjacent words.
        for i in range(len(boxes)):
            if i == 0 or not (boxes[i - 1][1] < boxes[i][3] and boxes[i][1] < boxes[i - 1][3]):
                labels[i][0] = 1.0
            if i == len(boxes) - 1 or not (
                boxes[i][1] < boxes[i + 1][3] and boxes[i + 1][1] < boxes[i][3]
            ):
                labels[i][1] = 1.0

        out_boxes = np.zeros((self.n_words, 4), dtype=np.float32)
        out_labels = np.zeros((self.n_words, 2), dtype=np.float32)
        k = min(len(boxes), self.n_words)
        out_boxes[:k] = np.asarray(boxes, dtype=np.float32)[:k]
        out_labels[:k] = np.asarray(labels, dtype=np.float32)[:k]
        return out_boxes, out_labels
