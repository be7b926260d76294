"""End-to-end OCR demo: train detection + recognition from scratch on
synthetic rendered-text pages, then run the full OcrPipeline and score it.

This is the synthetic-data analogue of BASELINE.json config #5 (full
three-stage detect -> group -> recognize on a validation set): every stage
— both trainers, checkpointing, the pipeline composition, geometry
postprocessing, batched decode — runs exactly as a user would run it, with
zero downloads.

Usage:
    PYTHONPATH=/root/repo python tools/e2e_demo.py [--pages 64] [--det-epochs 30]

Prints a final JSON line: {"line_recall": ..., "matched_cer": ...}.
"""

from __future__ import annotations

import argparse
import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

from ocrs_models_tpu.config import DEFAULT_ALPHABET
from ocrs_models_tpu.data import (
    SyntheticLayout,
    SyntheticRecognition,
    collate_detection,
    collate_layout,
    collate_recognition,
)
from ocrs_models_tpu.geometry import generate_mask
from ocrs_models_tpu.models import DetectionModel, LayoutModel, RecognitionModel
from ocrs_models_tpu.pipeline import OcrPipeline, group_lines_from_layout_probs
from ocrs_models_tpu.training.state import create_train_state
from ocrs_models_tpu.training.steps import (
    make_detection_steps,
    make_layout_steps,
    make_recognition_steps,
)
from ocrs_models_tpu.utils.text import decode_text, levenshtein


class SyntheticTextPages:
    """White 800x600 pages with real rendered text lines pasted at random
    rows; ground truth is the per-line box + text.

    ``hard=True`` moves the pages toward HierText realism (VERDICT round-3
    item 8): per-page illumination gradient + gaussian sensor noise, a
    wider multi-scale line range (0.35-1.1 vs 0.5-0.9), small line
    rotations (up to ±3°, within the reference's "horizontal" line filter
    tolerance — rotated ground truth becomes a true quad), and a
    two-column layout on half the pages."""

    def __init__(
        self,
        size: int,
        seed: int = 0,
        page: tuple[int, int] = (800, 600),
        hard: bool = False,
    ):
        self.size = size
        self.seed = seed
        self.page = page
        self.hard = hard
        self._lines = SyntheticRecognition(size=size * 10, seed=seed, max_chars=12)

    def __len__(self):
        return self.size

    def _paste(self, rng, img, crop, x0, y0, angle):
        """Paste (optionally rotated) crop; return (GT quad, pasted height)."""
        oh, ow = crop.shape[:2]  # pre-rotation extents
        if angle:
            from PIL import Image

            pil = Image.fromarray(crop[..., 0], mode="F")
            pil = pil.rotate(
                angle, resample=Image.BILINEAR, expand=True, fillcolor=0.45
            )
            crop = np.asarray(pil, np.float32)[..., None]
        fh, fw = crop.shape[:2]  # full (unclamped) post-rotation extents
        h, w = img.shape[:2]
        nh, nw = min(fh, h - y0), min(fw, w - x0)
        img[y0 : y0 + nh, x0 : x0 + nw] = np.minimum(
            img[y0 : y0 + nh, x0 : x0 + nw], crop[:nh, :nw]
        )
        if not angle:
            return [(x0, y0), (x0 + nw, y0), (x0 + nw, y0 + nh), (x0, y0 + nh)], nh
        # GT quad = original rect corners rotated about the crop centre
        # (PIL rotates about the centre, then expands symmetrically). The
        # centre uses the FULL expanded extents, not the page-edge-clamped
        # paste dims, or bottom-of-page quads would shift upward.
        a = np.deg2rad(-angle)  # PIL rotates counter-clockwise
        c, s = np.cos(a), np.sin(a)
        cy, cx = fh / 2.0, fw / 2.0
        quad = [
            (x0 + cx + dx * c - dy * s, y0 + cy + dx * s + dy * c)
            for dx, dy in (
                (-ow / 2, -oh / 2),
                (ow / 2, -oh / 2),
                (ow / 2, oh / 2),
                (-ow / 2, oh / 2),
            )
        ]
        return quad, nh

    def build(self, idx: int):
        rng = np.random.default_rng(self.seed * 7919 + idx)
        h, w = self.page
        img = np.full((h, w, 1), 0.45, np.float32)  # near-white
        two_col = self.hard and rng.uniform() < 0.5
        col_w = (w - 40) // 2 if two_col else w
        polys, texts = [], []
        from ocrs_models_tpu.data.augment import resize

        k = 0
        max_lines = 10 if self.hard else 8
        for col in range(2 if two_col else 1):
            cx0 = 20 + col * (col_w + 10) if two_col else 0
            y = 30
            while y < h - 80 and k < max_lines:
                line = self._lines[idx * 10 + k]
                crop, text = line["image"], line["text"]
                lh, lw = crop.shape[:2]
                scale = rng.uniform(0.35, 1.1) if self.hard else rng.uniform(0.5, 0.9)
                nh = max(12, int(lh * scale))
                nw = max(12, int(lw * scale))
                avail = col_w - 40 if two_col else w - 40
                if nw > avail:
                    nh = max(12, int(nh * avail / nw))
                    nw = avail
                crop = resize(crop, (nh, nw))
                lo = cx0 + 20 if two_col else 20
                hi = max(lo + 1, (cx0 + col_w if two_col else w) - nw - 20)
                x0 = int(rng.integers(lo, hi))
                angle = float(rng.uniform(-3, 3)) if self.hard else 0.0
                quad, ph = self._paste(rng, img, crop, x0, y, angle)
                polys.append(quad)
                texts.append(decode_text(text, DEFAULT_ALPHABET))
                y += ph + int(rng.integers(20, 60))
                k += 1
        if self.hard:
            # Illumination gradient + gaussian sensor noise.
            gy = rng.uniform(-0.04, 0.04)
            gx = rng.uniform(-0.04, 0.04)
            ramp = (
                np.linspace(-gy, gy, h)[:, None, None]
                + np.linspace(-gx, gx, w)[None, :, None]
            )
            img = img + ramp + rng.normal(0, 0.02, img.shape)
            img = np.clip(img, -0.5, 0.5).astype(np.float32)
        return img, polys, texts

    def __getitem__(self, idx: int) -> dict:
        img, polys, _ = self.build(idx)
        h, w = img.shape[:2]
        mask = generate_mask(w, h, polys, shrink_dist=3.0)[..., None]
        return {"image": img, "mask": mask}


def train_detection(pages, epochs: int, batch: int):
    model = DetectionModel(dtype=jnp.bfloat16)
    state = create_train_state(model, jax.random.key(0), jnp.zeros((1, 128, 128, 1)))
    step, _ = make_detection_steps(model)
    n = len(pages)
    order = np.arange(n)
    rng = np.random.default_rng(0)
    for epoch in range(epochs):
        rng.shuffle(order)
        losses = []
        for i in range(0, n - batch + 1, batch):
            samples = [pages[int(j)] for j in order[i : i + batch]]
            b = collate_detection(samples)
            b.pop("n_valid")
            state, m = step(state, jax.device_put(b), jnp.float32(2e-3))
            losses.append(float(m["loss"]))
        print(f"det epoch {epoch}: loss {np.mean(losses):.4f}", file=sys.stderr)
    return {"params": state.params, "batch_stats": state.batch_stats}


class PipelineConditionAugment:
    """Match training crops to what the pipeline actually feeds the
    recognizer: down-scaled pastes re-enlarged from detected boxes, with a
    little background margin around the line.

    ``hard=True`` additionally matches the hard-page distribution (round-4
    VERDICT item 6: the 9% hard-page matched CER came from evaluating on
    rotated/noisy/shaded crops the recognizer never trained on): small
    rotations like the pages' ±3° pastes, a per-crop illumination offset
    (the page-level ramp is ~constant at line scale), and gaussian sensor
    noise at the final crop resolution."""

    accepts_index = True

    def __init__(self, seed: int = 0, hard: bool = False):
        self.seed = seed
        self.hard = hard

    def __call__(self, img, idx=None):
        from ocrs_models_tpu.data.augment import resize

        rng = np.random.default_rng((self.seed, int(idx or 0)))
        h, w = img.shape[:2]
        # Margin like an expanded detection box.
        pad = int(rng.integers(0, 7))
        img = np.pad(img, ((pad, pad), (pad, pad), (0, 0)), constant_values=0.45)
        if self.hard and rng.uniform() < 0.8:
            from PIL import Image

            angle = float(rng.uniform(-3, 3))
            pil = Image.fromarray(img[..., 0], mode="F").rotate(
                angle, resample=Image.BILINEAR, expand=True, fillcolor=0.45
            )
            img = np.asarray(pil, np.float32)[..., None]
        # Simulate the paste-scale + re-resize blur (hard pages paste at
        # 0.35-1.1 scale vs 0.5-0.9).
        lo = 0.35 if self.hard else 0.5
        s = float(rng.uniform(lo, 1.0))
        nh, nw = max(8, int(img.shape[0] * s)), max(8, int(img.shape[1] * s))
        img = resize(img, (nh, nw))
        if self.hard:
            img = img + rng.uniform(-0.06, 0.06) + rng.normal(0, 0.02, img.shape)
            img = np.clip(img, -0.5, 0.5).astype(np.float32)
        return img


def train_recognition(n_samples: int, epochs: int, batch: int, hard: bool = False):
    model = RecognitionModel(n_classes=len(DEFAULT_ALPHABET) + 1, dtype=jnp.bfloat16)
    state = create_train_state(
        model, jax.random.key(0), jnp.zeros((1, 64, 64, 1)), grad_clip_norm=4.0
    )
    step, _ = make_recognition_steps(model)
    ds = SyntheticRecognition(
        size=n_samples,
        seed=3,
        max_chars=12,
        transform=PipelineConditionAugment(hard=hard),
    )
    order = np.arange(n_samples)
    rng = np.random.default_rng(0)
    for epoch in range(epochs):
        rng.shuffle(order)
        losses = []
        for i in range(0, n_samples - batch + 1, batch):
            b = collate_recognition([ds[int(j)] for j in order[i : i + batch]])
            state, m = step(state, jax.device_put(b), jnp.float32(1e-3))
            losses.append(float(m["loss"]))
        print(f"rec epoch {epoch}: loss {np.mean(losses):.4f}", file=sys.stderr)
    return {"params": state.params, "batch_stats": state.batch_stats}


def train_layout(epochs: int, batch: int = 16, n_words: int = 160):
    """Train the layout transformer on synthetic word-box pages (labels from
    the vertical-overlap rule, reference web_layout.py:140-172)."""
    model = LayoutModel(dtype=jnp.bfloat16)
    state = create_train_state(model, jax.random.key(0), jnp.zeros((1, 16, 4)))
    step, _ = make_layout_steps(model)
    ds = SyntheticLayout(size=256, n_words=n_words, seed=5)
    order = np.arange(len(ds))
    rng = np.random.default_rng(0)
    warmup = max(1, epochs // 5)
    for epoch in range(epochs):
        lr = 3e-4 * min(1.0, (epoch + 1) / warmup)  # reference: linear warmup
        rng.shuffle(order)
        losses = []
        for i in range(0, len(ds) - batch + 1, batch):
            b = collate_layout([ds[int(j)] for j in order[i : i + batch]])
            b.pop("n_valid")
            state, m = step(
                state, jax.device_put(b), jnp.float32(lr), jax.random.key(epoch)
            )
            losses.append(float(m["loss"]))
        if epoch % 10 == 0 or epoch == epochs - 1:
            print(f"layout epoch {epoch}: loss {np.mean(losses):.4f}", file=sys.stderr)
    return {"params": state.params}


def eval_layout_grouping(layout_vars, n_pages: int = 24, n_words: int = 160):
    """Line-grouping quality of the trained layout model vs the label rule
    on held-out word-box pages: exact-line precision/recall/F1 (a line
    counts when its member set matches ground truth exactly)."""
    model = LayoutModel(return_probs=True)
    fwd = jax.jit(lambda v, x: model.apply(v, x, train=False))
    ds = SyntheticLayout(size=n_pages, n_words=n_words, seed=77)
    tp = fp = fn = 0
    for i in range(n_pages):
        boxes, labels = ds[i]
        valid = (boxes[:, 2] - boxes[:, 0]) > 0
        k = int(valid.sum())
        probs = np.asarray(fwd(layout_vars, jnp.asarray(boxes[None])))[0, :k]
        pred = {
            tuple(members)
            for _, members in group_lines_from_layout_probs(boxes[:k], probs)
        }
        want = {
            tuple(members)
            for _, members in group_lines_from_layout_probs(boxes[:k], labels[:k])
        }
        tp += len(pred & want)
        fp += len(pred - want)
        fn += len(want - pred)
    precision = tp / max(tp + fp, 1)
    recall = tp / max(tp + fn, 1)
    f1 = 2 * precision * recall / max(precision + recall, 1e-9)
    return {"precision": precision, "recall": recall, "f1": f1}


def score_pipeline(pipe, eval_pages, n_pages: int, verbose_first: int = 6):
    total_lines = matched = cer_num = cer_den = 0
    for i in range(n_pages):
        img, polys, texts = eval_pages.build(i)
        result = pipe(img)
        for poly, text in zip(polys, texts):
            total_lines += 1
            gt = np.asarray(poly, np.float32)
            g = (gt[:, 0].min(), gt[:, 1].min(), gt[:, 0].max(), gt[:, 1].max())
            best = None
            for line in result:
                b = line.box
                ix = max(0, min(g[2], b[2]) - max(g[0], b[0]))
                iy = max(0, min(g[3], b[3]) - max(g[1], b[1]))
                inter = ix * iy
                area_g = (g[2] - g[0]) * (g[3] - g[1])
                area_b = max((b[2] - b[0]) * (b[3] - b[1]), 1e-6)
                iou = inter / (area_g + area_b - inter)
                if iou > 0.3 and (best is None or iou > best[0]):
                    best = (iou, line)
            if best is not None:
                matched += 1
                cer_num += levenshtein(text, best[1].text)
                cer_den += len(text)
                if total_lines <= verbose_first:
                    print(f'  pred "{best[1].text}" gt "{text}"', file=sys.stderr)
    return {
        "line_recall": round(matched / max(total_lines, 1), 3),
        "matched_cer": round(cer_num / max(cer_den, 1), 3),
        "total_lines": total_lines,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=48)
    ap.add_argument("--det-epochs", type=int, default=25)
    ap.add_argument("--rec-epochs", type=int, default=40)
    ap.add_argument("--rec-samples", type=int, default=480)
    ap.add_argument("--eval-pages", type=int, default=8)
    ap.add_argument(
        "--use-layout-model",
        action="store_true",
        help="also train the layout transformer, score its line grouping "
        "against the heuristic, and run the pipeline with it",
    )
    ap.add_argument("--layout-epochs", type=int, default=60)
    ap.add_argument(
        "--hard",
        action="store_true",
        help="HierText-realism pages: noise + illumination gradient, "
        "multi-scale lines (0.35-1.1), rotated lines (±3°, quad GT), "
        "two-column layouts",
    )
    args = ap.parse_args()

    pages = SyntheticTextPages(args.pages, seed=0, hard=args.hard)
    det_vars = train_detection(pages, args.det_epochs, batch=8)
    rec_vars = train_recognition(
        args.rec_samples, args.rec_epochs, batch=48, hard=args.hard
    )

    eval_pages = SyntheticTextPages(args.eval_pages, seed=99, hard=args.hard)
    pipe = OcrPipeline(det_vars, rec_vars)
    out = score_pipeline(pipe, eval_pages, args.eval_pages)

    if args.use_layout_model:
        layout_vars = train_layout(args.layout_epochs)
        out["layout_grouping"] = {
            k: round(v, 3) for k, v in eval_layout_grouping(layout_vars).items()
        }
        layout_pipe = OcrPipeline(
            det_vars,
            rec_vars,
            layout_variables=layout_vars,
            use_layout_model=True,
        )
        scored = score_pipeline(layout_pipe, eval_pages, args.eval_pages, 0)
        out["line_recall_layout"] = scored["line_recall"]
        out["matched_cer_layout"] = scored["matched_cer"]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
