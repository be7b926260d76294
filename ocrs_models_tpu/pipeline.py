"""End-to-end OCR inference pipeline: detect -> group lines -> recognize.

The reference repo trains the models and defers inference composition to
the downstream Rust ocrs engine; this module provides the full three-stage
path natively (BASELINE.json config #5): U-Net text detection, connected-
component word quads, line grouping via vertical overlap (optionally the
layout transformer), per-line crops batched into width buckets, CRNN
recognition, and batched greedy CTC decode.

Usage:
    pipe = OcrPipeline.from_checkpoints(det_ckpt, rec_ckpt)
    result = pipe(np_grey_image)   # -> list of (text, line_box)
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .config import DEFAULT_ALPHABET, SHRINK_DISTANCE, DetectionTrainConfig
from .data.augment import resize
from .data.collate import round_up
from .geometry import expand_quads, extract_cc_quads
from .models import DetectionModel, LayoutModel, RecognitionModel
from .utils.text import ctc_greedy_decode_batch, decode_text


@dataclasses.dataclass
class OcrLine:
    text: str
    box: tuple[float, float, float, float]  # (left, top, right, bottom)
    words: list[np.ndarray]  # word quads (4x2) composing the line


def _vertical_overlap(a, b) -> float:
    top = max(a[1], b[1])
    bottom = min(a[3], b[3])
    if bottom <= top:
        return 0.0
    return (bottom - top) / max(min(a[3] - a[1], b[3] - b[1]), 1e-6)


def group_words_into_lines(quads: np.ndarray, overlap_threshold: float = 0.5):
    """Group word quads into reading-order lines by vertical overlap of
    their AABBs — the same heuristic the layout training labels encode
    (reference web_layout.py:140-172), applied at inference."""
    if len(quads) == 0:
        return []
    boxes = np.stack([quads.min(axis=1), quads.max(axis=1)], axis=1).reshape(-1, 4)
    order = np.argsort(boxes[:, 1])  # by top
    lines: list[dict] = []
    for i in order:
        box = boxes[i]
        placed = False
        for line in lines:
            if _vertical_overlap(line["box"], box) >= overlap_threshold:
                line["members"].append(i)
                lb = line["box"]
                line["box"] = [
                    min(lb[0], box[0]), min(lb[1], box[1]),
                    max(lb[2], box[2]), max(lb[3], box[3]),
                ]
                placed = True
                break
        if not placed:
            lines.append({"box": list(box), "members": [i]})
    lines.sort(key=lambda ln: ln["box"][1])
    for line in lines:
        line["members"].sort(key=lambda i: boxes[i][0])  # left-to-right
    return [(np.array(ln["box"]), ln["members"]) for ln in lines]


def group_lines_from_layout_probs(
    boxes: np.ndarray,
    probs: np.ndarray,
    threshold: float = 0.5,
    geometry_guard: bool = True,
):
    """Split a reading-ordered word-box sequence into lines at predicted
    line starts (BASELINE config #5's 'layout-graph' stage).

    The model proposes, geometry vetoes: with ``geometry_guard`` a word
    whose box has no vertical overlap with the previous word cannot
    continue its line, whatever the predicted probability — a missed
    line_start otherwise merges two real lines and costs BOTH in line
    recall (the dominant failure mode of the learned grouping on clean
    pages; tools/e2e_demo.py round-3 measurement).

    :param boxes: ``[W, 4]`` word AABBs in reading order.
    :param probs: ``[W, 2]`` (line_start, line_end) probabilities.
    :return: same ``[(line_box, member_indices)]`` contract as
        :func:`group_words_into_lines`, in sequence order.
    """
    lines: list[dict] = []
    force_new = True
    for i, box in enumerate(boxes):
        new_line = probs[i, 0] >= threshold or force_new
        if not new_line and geometry_guard:
            if _vertical_overlap(boxes[i - 1], box) <= 0.0:
                new_line = True
        if new_line:
            lines.append({"box": list(box), "members": [i]})
        else:
            line = lines[-1]
            line["members"].append(i)
            lb = line["box"]
            line["box"] = [
                min(lb[0], box[0]), min(lb[1], box[1]),
                max(lb[2], box[2]), max(lb[3], box[3]),
            ]
        # A predicted line_end forces the next word to start a new line.
        force_new = probs[i, 1] >= threshold
    return [(np.array(ln["box"]), ln["members"]) for ln in lines]


class OcrPipeline:
    def __init__(
        self,
        det_variables,
        rec_variables,
        layout_variables=None,
        use_layout_model: bool = False,
        alphabet: str = DEFAULT_ALPHABET,
        det_size: Optional[tuple[int, int]] = None,
        rec_height: int = 64,
        max_line_width: int = 800,
        width_step: int = 256,
        threshold: float = 0.5,
        layout_pad_words: int = 500,
        mesh: Optional[jax.sharding.Mesh] = None,
        compute_dtype: jnp.dtype = jnp.float32,
    ):
        """``mesh``: optional 1-D data mesh for multi-chip serving — model
        variables are replicated and every fixed-shape serving batch
        (detection sub-batches, recognition chunks, the layout forward) is
        sharded along its leading axis, letting GSPMD run inference
        data-parallel across chips. Batches whose leading dim does not
        divide the mesh (e.g. the single-image latency path's exact-size
        buckets) fall back to single-device placement.

        ``compute_dtype``: matmul/conv operand dtype for the detection and
        recognition forwards. float32 (default) bit-matches the reference's
        fp32 inference for checkpoint parity; bfloat16 is the MXU-native
        serving fast path (params stay f32; text agreement vs f32 measured
        in tools/serve_bench.py). The layout transformer stays f32 — it is
        a negligible share of serving time."""
        if use_layout_model and layout_variables is None:
            raise ValueError("use_layout_model=True requires layout_variables")
        self.alphabet = alphabet
        self.det_size = det_size or DetectionTrainConfig().mask_size
        self.rec_height = rec_height
        self.max_line_width = max_line_width
        self.width_step = width_step
        self.threshold = threshold
        self.use_layout_model = use_layout_model
        self.layout_pad_words = layout_pad_words

        det_model = DetectionModel(dtype=compute_dtype)
        rec_model = RecognitionModel(
            n_classes=len(alphabet) + 1, dtype=compute_dtype
        )
        self.mesh = mesh
        if mesh is not None:
            from .parallel import batch_sharding, replicate_tree

            self._batch_sharding = batch_sharding(mesh)
            det_variables = replicate_tree(det_variables, mesh)
            rec_variables = replicate_tree(rec_variables, mesh)
            if layout_variables is not None:
                layout_variables = replicate_tree(layout_variables, mesh)
        self._det_vars = det_variables
        self._rec_vars = rec_variables
        self._det_fwd = jax.jit(
            lambda v, x: det_model.apply(v, x, train=False)
        )
        # Forward + threshold + bit-pack in one jit: the host only needs
        # the binary mask for CC labeling, so fetch W/8 uint8 bytes per
        # row instead of W float32 probabilities — 64x less host<->device
        # traffic (the fetch, not the forward, dominates remote-attached
        # inference; measured in tools/serve_bench.py). The threshold is a
        # traced argument, so mutating ``pipe.threshold`` takes effect on
        # the next call without recompiling.
        self._det_mask_jit = jax.jit(
            lambda v, x, thr: jnp.packbits(
                det_model.apply(v, x, train=False)[..., 0] > thr, axis=-1
            )
        )
        self._rec_fwd = jax.jit(
            lambda v, x: rec_model.apply(v, x, train=False)
        )
        self._decode = jax.jit(ctc_greedy_decode_batch)

        # Forward + argmax + CTC-greedy collapse in ONE jit: a recognition
        # chunk costs one dispatch and one small int fetch instead of
        # three dispatches + the [N, T, C] log-prob round trip.
        def _rec_decode(v, x, lens):
            log_probs = rec_model.apply(v, x, train=False)
            ids = jnp.argmax(log_probs, axis=-1).astype(jnp.int32)
            return ctc_greedy_decode_batch(ids, lens)

        self._rec_decode = jax.jit(_rec_decode)
        self._layout_vars = layout_variables
        if layout_variables is not None:
            layout_model = LayoutModel(return_probs=True)
            self._layout_fwd = jax.jit(
                lambda v, x: layout_model.apply(v, x, train=False)
            )

    def _det_mask(self, v, x):
        return self._det_mask_jit(v, x, jnp.float32(self.threshold))

    @classmethod
    def from_checkpoints(
        cls,
        det_ckpt: str,
        rec_ckpt: str,
        layout_ckpt: Optional[str] = None,
        **kwargs,
    ) -> "OcrPipeline":
        from .training.state import create_train_state
        from .utils.checkpoint import load_checkpoint

        det_model = DetectionModel()
        rec_model = RecognitionModel(n_classes=len(DEFAULT_ALPHABET) + 1)
        det_state = create_train_state(
            det_model, jax.random.key(0), jnp.zeros((1, 64, 64, 1))
        )
        det_state, _ = load_checkpoint(det_ckpt, det_state)
        rec_state = create_train_state(
            rec_model, jax.random.key(0), jnp.zeros((1, 64, 64, 1))
        )
        rec_state, _ = load_checkpoint(rec_ckpt, rec_state)
        layout_variables = None
        if layout_ckpt is not None:
            layout_state = create_train_state(
                LayoutModel(), jax.random.key(0), jnp.zeros((1, 32, 4))
            )
            layout_state, _ = load_checkpoint(layout_ckpt, layout_state)
            layout_variables = {"params": layout_state.params}
        return cls(
            {"params": det_state.params, "batch_stats": det_state.batch_stats},
            {"params": rec_state.params, "batch_stats": rec_state.batch_stats},
            layout_variables=layout_variables,
            **kwargs,
        )

    @classmethod
    def from_torch_state_dicts(cls, det_sd, rec_sd, **kwargs) -> "OcrPipeline":
        """Build directly from reference-format torch state dicts (e.g. the
        published ocrs checkpoints)."""
        from .export import (
            import_detection_state_dict,
            import_recognition_state_dict,
        )

        return cls(
            import_detection_state_dict(det_sd),
            import_recognition_state_dict(rec_sd),
            **kwargs,
        )

    # ------------------------------------------------------------- stages

    def _put(self, arr: np.ndarray):
        """Device-put a batch: sharded along the leading axis when a mesh
        is configured and the dim divides it, single-device otherwise."""
        if self.mesh is not None and arr.shape[0] % self.mesh.size == 0:
            return jax.device_put(arr, self._batch_sharding)
        return jnp.asarray(arr)

    def _unpack_mask(self, packed: np.ndarray) -> np.ndarray:
        """[H, ceil(W/8)] packed bits -> [H, W] uint8 binary mask."""
        return np.unpackbits(packed, axis=-1)[:, : self.det_size[1]]

    def detect_words(self, image: np.ndarray) -> np.ndarray:
        """Greyscale [-0.5, 0.5] HWC image -> Nx4x2 word quads (input scale)."""
        h, w = image.shape[:2]
        det_in = resize(image, self.det_size)
        packed = np.asarray(self._det_mask(self._det_vars, jnp.array(det_in[None])))
        binary = self._unpack_mask(packed[0])
        quads = extract_cc_quads(binary)
        quads = expand_quads(quads, dist=SHRINK_DISTANCE)
        # Map back to input resolution.
        scale = np.array([w / self.det_size[1], h / self.det_size[0]])
        return np.asarray(quads, dtype=np.float64) * scale

    def group_lines_with_layout_model(self, quads: np.ndarray):
        """Line grouping via the layout transformer: word quads in reading
        order -> (line_start, line_end) probabilities -> sequence splits.
        Same return contract as :func:`group_words_into_lines`."""
        if len(quads) == 0:
            return []
        boxes = np.stack(
            [quads.min(axis=1), quads.max(axis=1)], axis=1
        ).reshape(-1, 4)
        # Reading order: by top with a same-line tolerance, then left-to-
        # right (the order layout training data is serialized in,
        # reference web_layout.py:140-172).
        med_h = float(np.median(boxes[:, 3] - boxes[:, 1]))
        row = np.round(boxes[:, 1] / max(med_h, 1.0)).astype(np.int64)
        order = np.lexsort((boxes[:, 0], row))
        n = len(order)

        padded = np.zeros((1, self.layout_pad_words, 4), np.float32)
        k = min(n, self.layout_pad_words)
        padded[0, :k] = boxes[order[:k]]
        probs = np.asarray(self._layout_fwd(self._layout_vars, jnp.array(padded)))[
            0, :k
        ]
        lines = group_lines_from_layout_probs(boxes[order[:k]], probs)
        # Map member positions back to original quad indices; append any
        # overflow words (> pad size) as their own lines.
        mapped = [
            (box, [int(order[i]) for i in members]) for box, members in lines
        ]
        for i in order[k:]:
            mapped.append((boxes[i].copy(), [int(i)]))
        return mapped

    def recognize_lines(
        self, image: np.ndarray, line_boxes: list[np.ndarray]
    ) -> list[str]:
        """Crop line boxes, batch by width bucket, run CRNN + greedy decode.

        Single-image latency path: each width bucket runs as ONE batch of
        exactly its line count (no padding rows), trading recompiles for
        the lowest per-call device time. The serving path
        (:meth:`run_batch`) uses fixed ``rec_batch`` rows instead."""
        crops = [self._crop_line(image, box) for box in line_boxes]
        return self._recognize_crops(crops, rec_batch=None)

    def __call__(self, image: np.ndarray) -> list[OcrLine]:
        """Full pipeline on a greyscale HWC float image in [-0.5, 0.5]."""
        quads = self.detect_words(image)
        if self.use_layout_model:
            lines = self.group_lines_with_layout_model(quads)
        else:
            lines = group_words_into_lines(quads)
        line_boxes = [box for box, _ in lines]
        texts = self.recognize_lines(image, line_boxes)
        return [
            OcrLine(
                text=text,
                box=tuple(float(v) for v in box),
                words=[quads[i] for i in members],
            )
            for text, (box, members) in zip(texts, lines)
        ]

    # ------------------------------------------------------- batched serving

    def _crop_line(self, image: np.ndarray, box) -> Optional[np.ndarray]:
        """Crop one line box out of a page and resize to rec height.
        Returns None for degenerate boxes (the caller emits "")."""
        h, w = image.shape[:2]
        x0, y0, x1, y1 = box
        x0 = int(max(0, np.floor(x0)))
        y0 = int(max(0, np.floor(y0)))
        x1 = int(min(w, np.ceil(x1)))
        y1 = int(min(h, np.ceil(y1)))
        if x1 - x0 < 2 or y1 - y0 < 2:
            return None
        crop = image[y0:y1, x0:x1]
        aspect = (x1 - x0) / (y1 - y0)
        out_w = min(self.max_line_width, max(10, int(self.rec_height * aspect)))
        return resize(crop, (self.rec_height, out_w))

    def run_batch(
        self,
        images: list[np.ndarray],
        det_batch: int = 8,
        rec_batch: int = 128,
    ) -> list[list[OcrLine]]:
        """Multi-page serving path: the whole batch moves through each stage
        together so the accelerator always sees large, fixed shapes.

        - Detection forwards run in fixed ``det_batch`` sub-batches (the
          tail padded with zero pages, outputs dropped) — one compile.
        - Connected-component word quads + line grouping stay on the host
          C++ geometry core per page (dynamic component counts do not map
          to static shapes; the C++ union-find is microseconds per mask).
        - With the layout model, ALL pages' word boxes go through ONE
          padded ``[B, pad_words, 4]`` transformer forward.
        - Line crops from every page are pooled into GLOBAL width buckets
          and recognized in fixed ``rec_batch`` rows (tail rows zero-padded
          with length 0), so per-bucket compiles are shared across pages
          and the CRNN runs at its measured large-batch throughput instead
          of per-page partial batches.

        Compile count is bounded: one detection shape, one layout shape,
        and (#width buckets x 1) recognition shapes, all reused across
        calls with any number of pages.

        :param images: greyscale HWC float pages in [-0.5, 0.5] (sizes may
            differ; each is resized to the detection input resolution).
        :return: per page, the same ``list[OcrLine]`` as ``__call__``.
        """
        n_pages = len(images)
        if n_pages == 0:
            return []

        # ---- Stage 1: batched detection forward + host postprocess.
        det_h, det_w = self.det_size
        det_in = np.zeros((n_pages, det_h, det_w, 1), np.float32)
        for p, img in enumerate(images):
            det_in[p] = resize(img, self.det_size)
        page_quads: list[np.ndarray] = []
        for start in range(0, n_pages, det_batch):
            chunk = det_in[start : start + det_batch]
            pad = det_batch - len(chunk)
            if pad:
                chunk = np.concatenate(
                    [chunk, np.zeros((pad, det_h, det_w, 1), np.float32)]
                )
            packed = np.asarray(self._det_mask(self._det_vars, self._put(chunk)))
            for row in range(min(det_batch, n_pages - start)):
                p = start + row
                h, w = images[p].shape[:2]
                binary = self._unpack_mask(packed[row])
                quads = extract_cc_quads(binary)
                quads = expand_quads(quads, dist=SHRINK_DISTANCE)
                scale = np.array([w / det_w, h / det_h])
                page_quads.append(np.asarray(quads, np.float64) * scale)

        # ---- Stage 2: line grouping (one batched layout forward, or the
        # vertical-overlap heuristic per page).
        if self.use_layout_model:
            page_lines = self._group_lines_layout_batch(page_quads)
        else:
            page_lines = [group_words_into_lines(q) for q in page_quads]

        # ---- Stage 3: global width-bucketed recognition.
        flat_crops: list[Optional[np.ndarray]] = []
        flat_owner: list[tuple[int, int]] = []  # (page, line index)
        for p, lines in enumerate(page_lines):
            for li, (box, _) in enumerate(lines):
                flat_crops.append(self._crop_line(images[p], box))
                flat_owner.append((p, li))
        flat_texts = self._recognize_crops(flat_crops, rec_batch)

        # ---- Assemble per-page results.
        out: list[list[OcrLine]] = [[] for _ in range(n_pages)]
        for (p, li), text in zip(flat_owner, flat_texts):
            box, members = page_lines[p][li]
            out[p].append(
                OcrLine(
                    text=text,
                    box=tuple(float(v) for v in box),
                    words=[page_quads[p][i] for i in members],
                )
            )
        return out

    def _group_lines_layout_batch(self, page_quads: list[np.ndarray]):
        """Layout-model line grouping for many pages in ONE padded forward
        (pages with no words skip the model)."""
        n_pages = len(page_quads)
        padded = np.zeros((n_pages, self.layout_pad_words, 4), np.float32)
        orders: list[Optional[np.ndarray]] = [None] * n_pages
        boxes_all: list[Optional[np.ndarray]] = [None] * n_pages
        counts = np.zeros((n_pages,), np.int64)
        for p, quads in enumerate(page_quads):
            if len(quads) == 0:
                continue
            boxes = np.stack(
                [quads.min(axis=1), quads.max(axis=1)], axis=1
            ).reshape(-1, 4)
            med_h = float(np.median(boxes[:, 3] - boxes[:, 1]))
            row = np.round(boxes[:, 1] / max(med_h, 1.0)).astype(np.int64)
            order = np.lexsort((boxes[:, 0], row))
            k = min(len(order), self.layout_pad_words)
            padded[p, :k] = boxes[order[:k]]
            orders[p] = order
            boxes_all[p] = boxes
            counts[p] = k
        probs = np.asarray(self._layout_fwd(self._layout_vars, self._put(padded)))
        page_lines = []
        for p in range(n_pages):
            if orders[p] is None:
                page_lines.append([])
                continue
            order, boxes, k = orders[p], boxes_all[p], int(counts[p])
            lines = group_lines_from_layout_probs(
                boxes[order[:k]], probs[p, :k]
            )
            mapped = [
                (box, [int(order[i]) for i in members]) for box, members in lines
            ]
            for i in order[k:]:
                mapped.append((boxes[i].copy(), [int(i)]))
            page_lines.append(mapped)
        return page_lines

    def _recognize_crops(
        self, crops: list[Optional[np.ndarray]], rec_batch: Optional[int]
    ) -> list[str]:
        """Greedy-decode a flat crop list in width-bucket batches.

        ``rec_batch=None``: one exact-size batch per bucket (latency path —
        no padding rows, one compile per (bucket, count) shape).
        ``rec_batch=N``: fixed N-row chunks, tail zero-padded (serving
        path — ONE compiled shape per bucket, shared by every chunk, page,
        and call)."""
        texts = [""] * len(crops)
        valid = [i for i, c in enumerate(crops) if c is not None]
        if not valid:
            return texts
        widths = {
            i: min(
                round_up(crops[i].shape[1], self.width_step), self.max_line_width
            )
            for i in valid
        }
        for bucket in sorted(set(widths.values())):
            idxs = [i for i in valid if widths[i] == bucket]
            step = len(idxs) if rec_batch is None else rec_batch
            for start in range(0, len(idxs), step):
                rows = idxs[start : start + step]
                batch = np.zeros((step, self.rec_height, bucket, 1), np.float32)
                lens = np.zeros((step,), np.int32)
                for row, i in enumerate(rows):
                    wi = min(crops[i].shape[1], bucket)
                    batch[row, :, :wi] = crops[i][:, :wi]
                    lens[row] = wi // 4
                decoded, dec_lens = jax.device_get(
                    self._rec_decode(
                        self._rec_vars, self._put(batch), self._put(lens)
                    )
                )
                for row, i in enumerate(rows):
                    texts[i] = decode_text(
                        decoded[row, : dec_lens[row]], self.alphabet
                    )
        return texts
