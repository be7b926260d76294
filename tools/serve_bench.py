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
import sys
import time

sys.path.insert(0, "/root/repo/tools")

import numpy as np

from e2e_demo import SyntheticTextPages, train_detection, train_recognition

from ocrs_models_tpu.pipeline import OcrPipeline


def main(n_pages: int = 32, det_epochs: int = 25, rec_epochs: int = 40):
    train_pages = SyntheticTextPages(48, seed=0)
    det_vars = train_detection(train_pages, det_epochs, batch=8)
    rec_vars = train_recognition(480, rec_epochs, batch=48)
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
    print(json.dumps(results))


if __name__ == "__main__":
    main()
