"""Multi-page serving benchmark: OcrPipeline.run_batch vs per-page calls.

Trains detection + recognition from scratch on synthetic pages (exactly
tools/e2e_demo.py's recipe), then measures full end-to-end OCR serving
throughput (detect -> group -> recognize -> decode, host geometry
included) over a held-out page set, two ways:

  A. per-page: `pipe(img)` in a loop — the reference's serving shape
     (its downstream engine processes one image per call).
  B. batched:  `pipe.run_batch(imgs)` — batched detection forwards,
     one layout forward, global width-bucket recognition.

Also cross-checks that both paths emit identical texts (the run_batch
consistency gate on trained weights, complementing the random-weight
unit tests).

Run:  nohup python tools/serve_bench.py > /tmp/serve_bench.log 2>&1 &
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo/tools")

import numpy as np

from e2e_demo import SyntheticTextPages, train_detection, train_recognition

from ocrs_models_tpu.pipeline import OcrPipeline

CACHE = "/tmp/serve_bench_vars.msgpack"


def _get_vars(det_epochs, rec_epochs):
    """Train det+rec once and cache the variables (fast re-benching)."""
    import jax
    import jax.numpy as jnp
    from flax import serialization

    from ocrs_models_tpu.config import DEFAULT_ALPHABET
    from ocrs_models_tpu.models import DetectionModel, RecognitionModel

    if os.path.exists(CACHE):
        det = DetectionModel()
        rec = RecognitionModel(n_classes=len(DEFAULT_ALPHABET) + 1)
        tmpl = {
            "det": det.init(jax.random.key(0), jnp.zeros((1, 64, 64, 1)), train=False),
            "rec": rec.init(jax.random.key(1), jnp.zeros((1, 64, 64, 1)), train=False),
        }
        with open(CACHE, "rb") as f:
            blob = serialization.from_bytes(tmpl, f.read())
        print("loaded cached weights", file=sys.stderr)
        return blob["det"], blob["rec"]

    train_pages = SyntheticTextPages(48, seed=0)
    det_vars = train_detection(train_pages, det_epochs, batch=8)
    rec_vars = train_recognition(480, rec_epochs, batch=48)
    with open(CACHE, "wb") as f:
        f.write(serialization.to_bytes({"det": det_vars, "rec": rec_vars}))
    return det_vars, rec_vars


def _profile_batched(pipe, images, det_batch=8, rec_batch=128):
    """Per-stage wall time of the batched path (one repetition)."""
    from ocrs_models_tpu.pipeline import group_words_into_lines

    t = {}
    t0 = time.perf_counter()
    n_pages = len(images)
    det_h, det_w = pipe.det_size
    from ocrs_models_tpu.data.augment import resize

    det_in = np.zeros((n_pages, det_h, det_w, 1), np.float32)
    for p, img in enumerate(images):
        det_in[p] = resize(img, pipe.det_size)
    t["host_page_resize"] = time.perf_counter() - t0

    import jax.numpy as jnp

    from ocrs_models_tpu.config import SHRINK_DISTANCE
    from ocrs_models_tpu.geometry import expand_quads, extract_cc_quads

    t0 = time.perf_counter()
    all_packed = []
    for start in range(0, n_pages, det_batch):
        chunk = det_in[start : start + det_batch]
        pad = det_batch - len(chunk)
        if pad:
            chunk = np.concatenate(
                [chunk, np.zeros((pad, det_h, det_w, 1), np.float32)]
            )
        all_packed.append(
            np.asarray(pipe._det_mask(pipe._det_vars, jnp.array(chunk)))
        )
    t["det_forward"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    page_quads = []
    for p in range(n_pages):
        h, w = images[p].shape[:2]
        binary = pipe._unpack_mask(all_packed[p // det_batch][p % det_batch])
        quads = extract_cc_quads(binary)
        quads = expand_quads(quads, dist=SHRINK_DISTANCE)
        page_quads.append(
            np.asarray(quads, np.float64) * np.array([w / det_w, h / det_h])
        )
    t["host_cc_quads"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    page_lines = [group_words_into_lines(q) for q in page_quads]
    t["host_grouping"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    flat_crops, flat_owner = [], []
    for p, lines in enumerate(page_lines):
        for li, (box, _) in enumerate(lines):
            flat_crops.append(pipe._crop_line(images[p], box))
            flat_owner.append((p, li))
    t["host_crop_resize"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    pipe._recognize_crops(flat_crops, rec_batch)
    t["rec_forward_decode"] = time.perf_counter() - t0
    return {k: round(1e3 * v / n_pages, 2) for k, v in t.items()}


def main(n_pages: int = 32, det_epochs: int = 25, rec_epochs: int = 40):
    det_vars, rec_vars = _get_vars(det_epochs, rec_epochs)
    pipe = OcrPipeline(det_vars, rec_vars)

    eval_pages = SyntheticTextPages(n_pages, seed=123)
    images = [eval_pages.build(i)[0] for i in range(n_pages)]

    # Warm-up both paths (compiles: det batch-1 + batch-8, rec buckets).
    _ = pipe(images[0])
    _ = pipe.run_batch(images[:2])

    def run_single():
        return [pipe(img) for img in images]

    def run_batched():
        return pipe.run_batch(images)

    results = {}
    for name, fn in (("per_page", run_single), ("batched", run_batched)):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = fn()
            # Host-side strings: the result IS host data, no fence needed.
            dt = time.perf_counter() - t0
            best = min(best, dt)
        results[name] = {
            "pages_per_sec": round(n_pages / best, 2),
            "ms_per_page": round(1e3 * best / n_pages, 2),
        }
        results[name + "_out"] = out

    a, b = results.pop("per_page_out"), results.pop("batched_out")
    texts_a = [[ln.text for ln in page] for page in a]
    texts_b = [[ln.text for ln in page] for page in b]
    n_lines = sum(len(p) for p in texts_a)
    match = sum(
        ta == tb for pa, pb in zip(texts_a, texts_b) for ta, tb in zip(pa, pb)
    )
    results["n_pages"] = n_pages
    results["n_lines"] = n_lines
    results["identical_line_texts"] = match
    results["speedup"] = round(
        results["batched"]["pages_per_sec"]
        / max(results["per_page"]["pages_per_sec"], 1e-9),
        2,
    )
    results["batched_stage_ms_per_page"] = _profile_batched(pipe, images)

    # bf16 serving fast path: batched throughput + text agreement vs f32.
    import jax.numpy as jnp

    pipe16 = OcrPipeline(det_vars, rec_vars, compute_dtype=jnp.bfloat16)
    _ = pipe16.run_batch(images[:2])  # warm-up/compile
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out16 = pipe16.run_batch(images)
        best = min(best, time.perf_counter() - t0)
    texts16 = [[ln.text for ln in page] for page in out16]
    match16 = sum(
        ta == tb for pa, pb in zip(texts_b, texts16) for ta, tb in zip(pa, pb)
    )
    results["batched_bf16"] = {
        "pages_per_sec": round(n_pages / best, 2),
        "ms_per_page": round(1e3 * best / n_pages, 2),
        "lines_vs_f32": f"{match16}/{n_lines} identical texts",
        "n_lines_bf16": sum(len(p) for p in texts16),
    }
    print(json.dumps(results))


if __name__ == "__main__":
    main()
