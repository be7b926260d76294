"""Batch collation with XLA-friendly static shapes.

Recognition batches bucket image widths up to multiples of 256 px (the
reference rounds for GPU memory-fragmentation avoidance, train_rec.py:
261-272; under XLA the same bucketing bounds the number of compiled
programs). CTC-incompatible samples are masked via ``sample_weight``
instead of dropped (the static-shape equivalent of train_rec.py:277-283),
and batches pad up to a multiple of the mesh size with zero-weight rows.
"""

from __future__ import annotations

import numpy as np


def round_up(val: int, unit: int) -> int:
    return ((val + unit - 1) // unit) * unit


def ctc_input_and_target_compatible(input_len: int, target: np.ndarray) -> bool:
    """CTC requires ``input_len >= target_len + #adjacent-repeats`` (repeats
    need a separating blank; reference train_rec.py:220-239)."""
    target = np.asarray(target)
    target_len = len(target)
    min_input_len = max(1, target_len)
    if target_len > 1:
        min_input_len += int(np.count_nonzero(target[1:] == target[:-1]))
    return input_len >= min_input_len


def collate_recognition(
    samples: list[dict],
    width_step: int = 256,
    downsample: int = 4,
    batch_multiple: int = 1,
    max_width: int = 800,
) -> dict:
    """Collate text-line samples into a padded recognition batch.

    Each sample: ``{"image": [64, W, 1] float32, "text": [L] int32}``.
    Returns ``image`` [N,64,Wmax,1], ``text`` [N,Lmax], ``text_len`` [N],
    ``image_width`` [N], ``sample_weight`` [N].
    """
    widths = [s["image"].shape[1] for s in samples]
    text_lens = [len(s["text"]) for s in samples]

    wmax = min(round_up(max(widths), width_step), round_up(max_width, width_step))
    lmax = round_up(max(max(text_lens), 1), width_step // downsample)

    n = round_up(len(samples), batch_multiple)
    h = samples[0]["image"].shape[0]
    images = np.zeros((n, h, wmax, 1), dtype=np.float32)
    text = np.zeros((n, lmax), dtype=np.int32)
    text_len = np.zeros((n,), dtype=np.int32)
    image_width = np.full((n,), wmax, dtype=np.int32)
    weight = np.zeros((n,), dtype=np.float32)

    for i, s in enumerate(samples):
        w = widths[i]
        images[i, :, :w, :] = s["image"][:, :wmax, :]
        tl = text_lens[i]
        text[i, :tl] = s["text"][:lmax]
        text_len[i] = tl
        image_width[i] = min(w, wmax)
        if ctc_input_and_target_compatible(min(w, wmax) // downsample, s["text"]):
            weight[i] = 1.0

    return {
        "image": images,
        "text": text,
        "text_len": text_len,
        "image_width": image_width,
        "sample_weight": weight,
    }


def collate_detection(samples: list[dict], batch_multiple: int = 1) -> dict:
    """Collate fixed-size detection samples.

    Each sample: ``{"image": [H, W, 1], "mask": [H, W, 1]}``. Rows padding
    the batch to ``batch_multiple`` replicate the final sample so every row
    is well-formed, but carry ``sample_weight`` 0 and are excluded from the
    loss.
    """
    n = round_up(len(samples), batch_multiple)
    out_img = np.stack(
        [samples[min(i, len(samples) - 1)]["image"] for i in range(n)]
    ).astype(np.float32)
    out_mask = np.stack(
        [samples[min(i, len(samples) - 1)]["mask"] for i in range(n)]
    ).astype(np.float32)
    weight = np.zeros((n,), np.float32)
    weight[: len(samples)] = 1.0
    batch = {
        "image": out_img,
        "mask": out_mask,
        "sample_weight": weight,
        "n_valid": len(samples),
    }
    paths = [s.get("path") for s in samples]
    if any(p is not None for p in paths):
        batch["path"] = paths
    return batch


def collate_layout(samples: list[tuple], batch_multiple: int = 1) -> dict:
    """Collate (boxes [W,4], labels [W,2]) tuples, already padded to a fixed
    word count by the dataset. Batch-padding rows carry zero weight."""
    n = round_up(len(samples), batch_multiple)
    boxes = np.stack(
        [samples[min(i, len(samples) - 1)][0] for i in range(n)]
    ).astype(np.float32)
    labels = np.stack(
        [samples[min(i, len(samples) - 1)][1] for i in range(n)]
    ).astype(np.float32)
    weight = np.zeros((n,), np.float32)
    weight[: len(samples)] = 1.0
    return {
        "boxes": boxes,
        "labels": labels,
        "sample_weight": weight,
        "n_valid": len(samples),
    }
