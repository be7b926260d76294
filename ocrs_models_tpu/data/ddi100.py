"""DDI-100 detection dataset (legacy, reference datasets/ddi100.py).

Distorted Document Images: scanned pages with pickled word-quad GT. The
pickle loader is restricted to numpy reconstruction globals only — pickles
are otherwise arbitrary-code-execution, and this dataset is third-party
data (same posture as the reference's DDI100Unpickler, ddi100.py:11-31).
"""

from __future__ import annotations

import os
import pickle
from typing import Optional

import numpy as np
from PIL import Image


class RestrictedUnpickler(pickle.Unpickler):
    _ALLOWED = {
        "numpy.dtype",
        "numpy.ndarray",
        "numpy.core.multiarray._reconstruct",
        "numpy._core.multiarray._reconstruct",
    }

    def find_class(self, module, name):
        path = f"{module}.{name}"
        if path == "numpy.dtype":
            return np.dtype
        if path == "numpy.ndarray":
            return np.ndarray
        if path in (
            "numpy.core.multiarray._reconstruct",
            "numpy._core.multiarray._reconstruct",
        ):
            from numpy.core.multiarray import _reconstruct

            return _reconstruct
        raise pickle.UnpicklingError(f"Disallowed class {path}")


class DDI100:
    """Detection samples ``{"image", "mask", "path"}`` with a 90/10
    in-order train/val split."""

    def __init__(
        self,
        root_dir: str,
        train: bool = True,
        transform=None,
        max_images: Optional[int] = None,
        shrink_dist: float = 3.0,
    ):
        from ..geometry import generate_mask

        self._generate_mask = generate_mask
        self._img_dir = f"{root_dir}/gen_imgs"
        self._boxes_dir = f"{root_dir}/gen_boxes"
        if not os.path.exists(self._img_dir):
            raise FileNotFoundError(f"Dataset images not found in {self._img_dir}")
        if not os.path.exists(self._boxes_dir):
            raise FileNotFoundError(f"Dataset masks not found in {self._boxes_dir}")

        names = sorted(os.listdir(self._img_dir))
        if max_images is not None:
            names = names[:max_images]
        split = int(len(names) * 0.9)
        self._img_filenames = names[:split] if train else names[split:]
        self.transform = transform
        self.shrink_dist = shrink_dist

    def __len__(self):
        return len(self._img_filenames)

    def __getitem__(self, idx: int) -> dict:
        fname = self._img_filenames[idx]
        base, _ = os.path.splitext(fname)
        img_path = f"{self._img_dir}/{fname}"
        with Image.open(img_path) as img:
            arr = np.asarray(img.convert("L"), dtype=np.float32)
        image = (arr / 255.0 - 0.5)[..., None]

        with open(f"{self._boxes_dir}/{base}.pickle", "rb") as f:
            words = RestrictedUnpickler(f).load()
        # DDI-100 stores quads as (y, x) corner arrays; swap to (x, y).
        polys = [[(float(c[1]), float(c[0])) for c in w["box"]] for w in words]

        h, w = image.shape[:2]
        mask = self._generate_mask(w, h, polys, shrink_dist=self.shrink_dist)[..., None]
        if self.transform:
            if getattr(self.transform, "accepts_index", False):
                image, mask = self.transform(image, mask, idx=idx)
            else:
                image, mask = self.transform(image, mask)
        return {"image": image, "mask": mask, "path": img_path}
