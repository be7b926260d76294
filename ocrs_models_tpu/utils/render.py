"""Debug rendering: quads over images, labeled word boxes.

Capability parity with the reference's ``draw_quads`` (postprocess.py:
190-211) and ``draw_word_boxes`` (datasets/util.py:207-292).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
from PIL import Image, ImageDraw

from .image import untransform_image


def to_pil_grey(img: np.ndarray) -> Image.Image:
    """HWC or HW float [-0.5, 0.5] or uint8 -> PIL greyscale image."""
    arr = np.asarray(img)
    if arr.ndim == 3:
        arr = arr[..., 0]
    if arr.dtype != np.uint8:
        arr = untransform_image(arr)
    return Image.fromarray(arr, mode="L")


def draw_quads(img: np.ndarray, quads: np.ndarray) -> Image.Image:
    """Copy of ``img`` with quad outlines drawn in red."""
    out = to_pil_grey(img).convert("RGB")
    draw = ImageDraw.Draw(out)
    for quad in np.asarray(quads).reshape(-1, 4, 2):
        verts = [(float(x), float(y)) for x, y in quad]
        for i, start in enumerate(verts):
            end = verts[(i + 1) % len(verts)]
            draw.line((start, end), fill="red", width=2)
    return out


def draw_word_boxes(
    img_path: str,
    width: int,
    height: int,
    word_boxes: np.ndarray,
    labels: Optional[np.ndarray] = None,
    probs: Optional[np.ndarray] = None,
    threshold: float = 0.5,
    normalized_coords: bool = False,
) -> None:
    """Render word boxes colored by (line_start, line_end) labels — green =
    both, blue = start, red = end, black = neither — or by probability."""
    word_boxes = np.asarray(word_boxes)
    n_words = len(word_boxes)
    img = Image.new("RGB", (width, height), "white")
    draw = ImageDraw.Draw(img)

    def sx(c):
        return (c + 0.5) * width if normalized_coords else c

    def sy(c):
        return (c + 0.5) * height if normalized_coords else c

    for i in range(n_words):
        left, top, right, bottom = word_boxes[i].tolist()
        box = (sx(left), sy(top), sx(right), sy(bottom))
        color: str | tuple = "black"
        if labels is not None:
            ls, le = bool(labels[i][0]), bool(labels[i][1])
            color = {
                (True, True): "green",
                (True, False): "blue",
                (False, True): "red",
                (False, False): "black",
            }[(ls, le)]
        elif probs is not None:
            p = float(probs[i])
            if p > threshold:
                color = (255, 0, 0)
            else:
                v = 255 - round(p * 235)
                color = (v, v, v)
        if box[2] <= box[0] and box[3] <= box[1]:
            continue  # zero-area padding box
        draw.rectangle(box, fill=None, outline=color, width=2)
    img.save(img_path)
