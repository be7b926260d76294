"""HierText dataset pipelines (detection pages + recognition line crops).

Capability parity with the reference's ``datasets/hiertext.py``: the same
gzipped-GT -> JSONL one-time conversion, the same text-line quality filters
(legible, horizontal, >=10px, word/line area ratio >= 0.8, aspect >= 1,
hiertext.py:323-401), the same on-disk line-crop PNG cache with
atomic-rename writes safe under concurrent workers (hiertext.py:226-231),
polygon mask-out of out-of-line pixels to black, and aspect-preserving
resize to 64px height with width in [10, 800].

Differences by design: images are HWC numpy float32 (TPU layout), decode is
PIL-based, and masks come from the first-party geometry kit instead of
Shapely/PIL.
"""

from __future__ import annotations

import gzip
import json
import os
from typing import Optional

import numpy as np
from PIL import Image

from ..config import DEFAULT_ALPHABET, SHRINK_DISTANCE
from ..geometry import generate_mask
from ..utils.text import encode_text
from .augment import resize


def _read_grey(path: str) -> np.ndarray:
    """Read an image as [H, W, 1] float32 in [-0.5, 0.5]."""
    with Image.open(path) as img:
        arr = np.asarray(img.convert("L"), dtype=np.float32)
    return (arr / 255.0 - 0.5)[..., None]


def convert_annotations_to_jsonl(annotations_file: str, lines_file: str) -> None:
    """One-time gzipped-JSON -> JSONL conversion (one line per image); the GT
    file is plain JSON despite its .jsonl.gz suffix."""
    if os.path.exists(lines_file) and os.path.getmtime(lines_file) >= os.path.getmtime(
        annotations_file
    ):
        return
    print("Converting annotations from JSON to JSONL format...")
    with gzip.open(annotations_file) as in_fp:
        annotations = json.load(in_fp)["annotations"]
    tmp = lines_file + ".tmp"
    with open(tmp, "w") as out_fp:
        for ann in annotations:
            out_fp.write(json.dumps(ann) + "\n")
    os.rename(tmp, lines_file)


# Text-line quality filters (reference hiertext.py:323-334).
MIN_WIDTH = 10
MIN_HEIGHT = 10
MIN_WORD_TO_LINE_AREA_RATIO = 0.8
MIN_ASPECT_RATIO = 1.0


def _bbox_size(vertices) -> tuple[float, float]:
    xs = [v[0] for v in vertices]
    ys = [v[1] for v in vertices]
    return max(xs) - min(xs), max(ys) - min(ys)


def generate_line_annotations(annotations_file: str, lines_file: str) -> None:
    """One-time GT -> per-text-line JSONL with quality filters and a kept/
    dropped statistics printout."""
    if os.path.exists(lines_file) and os.path.getmtime(lines_file) >= os.path.getmtime(
        annotations_file
    ):
        return

    stats = {
        "total": 0,
        "usable": 0,
        "legible": 0,
        "horizontal": 0,
        "size_ok": 0,
        "handwritten": 0,
        "area_ratio_ok": 0,
        "aspect_ok": 0,
    }
    print(f"Extracting text line annotations from {annotations_file}")
    with gzip.open(annotations_file) as in_fp:
        annotations = json.load(in_fp)["annotations"]

    tmp = lines_file + ".tmp"
    with open(tmp, "w") as out_fp:
        for ann in annotations:
            for para in ann["paragraphs"]:
                for line in para["lines"]:
                    vertices = line["vertices"]
                    width, height = _bbox_size(vertices)
                    aspect_ok = height > 0 and width / height >= MIN_ASPECT_RATIO
                    words_w, words_h = _bbox_size(
                        [v for w in line["words"] for v in w["vertices"]]
                    ) if line["words"] else (0.0, 0.0)
                    area_ratio_ok = (
                        width * height > 0
                        and (words_w * words_h) / (width * height)
                        >= MIN_WORD_TO_LINE_AREA_RATIO
                    )
                    legible = line["legible"]
                    horizontal = not line["vertical"]
                    size_ok = width >= MIN_WIDTH and height >= MIN_HEIGHT

                    stats["total"] += 1
                    stats["legible"] += legible
                    stats["horizontal"] += horizontal
                    stats["size_ok"] += size_ok
                    stats["area_ratio_ok"] += area_ratio_ok
                    stats["aspect_ok"] += aspect_ok
                    stats["handwritten"] += line["handwritten"]

                    if not (legible and size_ok and horizontal and area_ratio_ok and aspect_ok):
                        continue
                    stats["usable"] += 1
                    out_fp.write(
                        json.dumps(
                            {
                                "image_id": ann["image_id"],
                                "vertices": vertices,
                                "text": line["text"],
                            }
                        )
                        + "\n"
                    )
    os.rename(tmp, lines_file)
    total = max(stats["total"], 1)
    for k, v in stats.items():
        print(f"{k}: {v} ({round(v / total * 100, 1)}%)")


class HierTextDetection:
    """Full-page detection samples: ``{"image", "mask", "path"}``."""

    def __init__(
        self,
        root_dir: str,
        train: bool = True,
        transform=None,
        max_images: Optional[int] = None,
        shrink_dist: float = SHRINK_DISTANCE,
    ):
        split = "train" if train else "validation"
        self._img_dir = f"{root_dir}/{split}"
        annotations_file = f"{root_dir}/gt/{split}.jsonl.gz"
        if not os.path.exists(self._img_dir):
            raise FileNotFoundError(f'Image directory "{self._img_dir}" not found')
        if not os.path.exists(annotations_file):
            raise FileNotFoundError(f'Label data file "{annotations_file}" not found')

        lines_file = annotations_file.replace(".jsonl.gz", ".jsonl")
        convert_annotations_to_jsonl(annotations_file, lines_file)
        with open(lines_file) as fp:
            self._annotations = fp.readlines()
        if max_images:
            self._annotations = self._annotations[:max_images]
        self.transform = transform
        self.shrink_dist = shrink_dist

    def __len__(self):
        return len(self._annotations)

    def __getitem__(self, idx: int) -> dict:
        ann = json.loads(self._annotations[idx])
        img_path = f"{self._img_dir}/{ann['image_id']}.jpg"
        word_polys = [
            [tuple(c) for c in word["vertices"]]
            for para in ann["paragraphs"]
            for line in para["lines"]
            for word in line["words"]
        ]
        image = _read_grey(img_path)
        h, w = image.shape[:2]
        mask = generate_mask(w, h, word_polys, shrink_dist=self.shrink_dist)[..., None]
        if self.transform:
            if getattr(self.transform, "accepts_index", False):
                image, mask = self.transform(image, mask, idx=idx)
            else:
                image, mask = self.transform(image, mask)
        return {"image": image, "mask": mask, "path": img_path}


class HierTextRecognition:
    """Text-line recognition samples: ``{"image", "text", "image_id"}``."""

    def __init__(
        self,
        root_dir: str,
        train: bool = True,
        transform=None,
        max_images: Optional[int] = None,
        alphabet: str = DEFAULT_ALPHABET,
        output_height: int = 64,
        max_width: int = 800,
    ):
        split = "train" if train else "validation"
        self._img_dir = f"{root_dir}/{split}"
        self._cache_dir = f"{root_dir}/{split}-lines-cache"
        annotations_file = f"{root_dir}/gt/{split}.jsonl.gz"
        if not os.path.exists(self._img_dir):
            raise FileNotFoundError(f'Image directory "{self._img_dir}" not found')
        if not os.path.exists(annotations_file):
            raise FileNotFoundError(f'Label data file "{annotations_file}" not found')

        lines_file = annotations_file.replace(".jsonl.gz", "-lines.jsonl")
        generate_line_annotations(annotations_file, lines_file)
        with open(lines_file) as fp:
            self._text_lines = fp.readlines()
        if max_images:
            self._text_lines = self._text_lines[:max_images]

        self.alphabet = alphabet
        self.transform = transform
        self.output_height = output_height
        self.max_width = max_width

    def __len__(self):
        return len(self._text_lines)

    def _get_line_image(self, image_id, min_x, max_x, min_y, max_y) -> np.ndarray:
        """Load a line crop through the on-disk PNG cache (atomic-rename
        writes tolerate concurrent workers)."""
        cache_path = f"{self._cache_dir}/{image_id}/{min_x}_{min_y}_{max_x}_{max_y}.png"
        if not os.path.exists(cache_path):
            with Image.open(f"{self._img_dir}/{image_id}.jpg") as img:
                grey = img.convert("L")
                iw, ih = grey.size
                x0 = min(max(min_x, 0), iw - 1)
                x1 = min(max(max_x, 0), iw - 1)
                y0 = min(max(min_y, 0), ih - 1)
                y1 = min(max(max_y, 0), ih - 1)
                crop = grey.crop((x0, y0, x1, y1))
            os.makedirs(os.path.dirname(cache_path), exist_ok=True)
            tmp_path = cache_path + f".tmp{os.getpid()}"
            crop.save(tmp_path, format="PNG")
            os.rename(tmp_path, cache_path)
        return _read_grey(cache_path)

    def __getitem__(self, idx: int) -> dict:
        text_line = json.loads(self._text_lines[idx])
        img_id = text_line["image_id"]
        line_poly = [(c[0], c[1]) for c in text_line["vertices"]]
        min_x = max(0, min(x for x, _ in line_poly))
        max_x = max(min_x, max(x for x, _ in line_poly))
        min_y = max(0, min(y for _, y in line_poly))
        max_y = max(min_y, max(y for _, y in line_poly))

        image = self._get_line_image(img_id, min_x, max_x, min_y, max_y)
        h, w = image.shape[:2]

        # Mask out pixels outside the line polygon to black (-0.5).
        shifted = [(x - min_x, y - min_y) for x, y in line_poly]
        mask = generate_mask(w, h, [shifted], shrink_dist=0.0)[..., None]
        image = image * mask + (-0.5) * (1.0 - mask)

        if self.transform:
            if getattr(self.transform, "accepts_index", False):
                image = self.transform(image, idx=idx)
            else:
                image = self.transform(image)
            image = np.clip(image, -0.5, 0.5)
            h, w = image.shape[:2]

        # Aspect-preserving resize to the model height; width clamped to
        # [10, 800] (zero-width guard below, batch memory bound above).
        aspect = w / max(h, 1)
        out_w = min(self.max_width, max(10, int(self.output_height * aspect)))
        image = resize(image, (self.output_height, out_w))

        return {
            "image_id": img_id,
            "image": image.astype(np.float32),
            "text": encode_text(text_line["text"], self.alphabet),
        }
