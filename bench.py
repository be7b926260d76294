"""Benchmark suite: one JSON line per task/shape, headline guaranteed.

Hang-proof supervisor/worker design (round 3's driver capture was lost to
an axon backend-init hang: BENCH_r03.json rc=124, parsed=null):

- ``python bench.py`` runs the *supervisor*: a jax-free parent that
  (1) probes backend init in a subprocess with a hard timeout,
  (2) streams the worker's JSON lines to stdout as they arrive,
  (3) enforces a global wall-clock budget (env ``BENCH_BUDGET_S``,
      default 480 s) and kills the worker at the deadline, and
  (4) guarantees the LAST stdout line always parses: the headline metric
      re-emitted if captured, else a structured ``backend_unavailable``
      diagnostic. A wedged backend can no longer zero out the round.
      Before that final headline, EVERY completed section's metric is
      re-emitted in one compact block, so the driver's bounded stdout
      tail always records the full metric set (round 4 lost the plain
      wide-bucket line to tail truncation).
- ``python bench.py --worker`` runs the actual benchmarks, HEADLINE
  FIRST, each section fenced by a SIGALRM watchdog + try/except so one
  bad section cannot eat the rest. The headline section itself gets
  three chances: a 300 s first attempt (it absorbs the post-reset
  backend ramp), an immediate 420 s retry, and an end-of-run backstop.
- ``python bench.py --warm`` pre-warms the persistent compile cache:
  worker in-process, no budget, no watchdogs. Run once after a machine
  reset — a cold 800x608 detection compile can exceed its watchdog, and
  the alarm aborts the compile before the cache entry is written, so a
  budgeted run can never self-heal that section.

Sections (BASELINE.json configs 1-4; hiertext.py caps line crops at
W<=800 which buckets to 1024):

- HEADLINE (first computed, re-emitted last by the supervisor):
  recognition train step, batch 256 x 64x256 crops/sec/chip vs the
  5k/sec/chip target
- recognition train step, wide bucket W=1024 (T=257), batch 128
- recognition mixed-bucket epoch (55% W=256 / 30% W=512 / 15% W=1024,
  crop-count-weighted) — the realistic HierText width mix
- detection train step, 800x608 bf16, batch 4 and 8 (img/sec/chip)
- detection inference, 512x512 forward + postprocess-to-word-boxes
  latency (BASELINE config #2)
- recognition inference, single-crop forward + on-device greedy decode
  latency (BASELINE config #1)
- layout train step, 500 words, batch 64 (pages/sec/chip)
- bonus (tail, shed first on slow days): wide bucket with grad_accum=4
  (microbatch 128, effective batch 512 — the scan amortizes per-step
  dispatch/optimizer cost, ~9% over the plain b128 step), and detection
  with grad_accum=4 (microbatch 4, effective batch 16 — beats the plain
  b8 step by ~17% at equal-or-larger effective batch)

Timing is fenced with a value fetch (block_until_ready returns early on
this image's axon remote buffers).
"""

import json
import os
import signal
import subprocess
import sys
import threading
import time
import traceback

TARGET = 5000.0  # driver-set crops/sec/chip (BASELINE.json:5)
HEADLINE = "recognition_train_crops_per_sec_per_chip"


def _emit(metric, value, unit, vs_baseline=None):
    line = json.dumps(
        {
            "metric": metric,
            "value": round(value, 1),
            "unit": unit,
            "vs_baseline": (
                round(vs_baseline, 3) if vs_baseline is not None else None
            ),
        }
    )
    print(line, flush=True)
    return line


# --------------------------------------------------------------------------
# Supervisor (jax-free; cannot hang on backend init)
# --------------------------------------------------------------------------

def _setup_jax_config():
    """Shared jax config for probe + worker. BENCH_FORCE_CPU=1 pins jax to
    the host CPU backend (this image's axon sitecustomize force-sets
    jax_platforms, so the config update after import — not the env var —
    is what works; see tests/conftest.py). The persistent compilation
    cache makes repeat captures (driver re-runs, probe-then-worker) skip
    the expensive 800x608 detection compiles."""
    import jax

    if os.environ.get("BENCH_FORCE_CPU") == "1":
        jax.config.update("jax_platforms", "cpu")
    cache_dir = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
    )
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax without the persistent cache — run uncached


def _backend_util():
    """Load utils/backend.py as a standalone module — the shared probe
    implementation — WITHOUT importing the ocrs_models_tpu package (whose
    __init__ pulls in jax-heavy modules; the supervisor stays jax-free)."""
    import importlib.util

    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "ocrs_models_tpu", "utils", "backend.py",
    )
    spec = importlib.util.spec_from_file_location("_bench_backend_util", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def probe_backend(timeout_s):
    """Initialize the jax backend in a throwaway subprocess. Returns
    (ok, detail). A hang or crash there cannot take this process down."""
    util = _backend_util()
    platform = "cpu" if os.environ.get("BENCH_FORCE_CPU") == "1" else None
    try:
        got = util.ensure_backend(timeout_s=timeout_s, platform=platform, force=True)
        return True, f"platform={got}"
    except util.BackendUnavailableError as e:
        return False, str(e)[:200]


def _headline_expected(argv):
    """Mirrors the worker's section filter (guarded: run iff `only in
    name`): the headline section only runs when the --task substring
    matches its name."""
    if "--task" not in argv:
        return True
    return argv[argv.index("--task") + 1] in "rec_headline_retry"


def supervise(argv):
    start = time.monotonic()
    budget = float(os.environ.get("BENCH_BUDGET_S", "480"))
    deadline = start + budget

    def remaining():
        return deadline - time.monotonic()

    # 1. Bounded backend probe (up to 2 tries — a transient tunnel blip on
    # try 1 should not zero the round).
    ok = False
    detail = ""
    for attempt in range(2):
        ok, detail = probe_backend(min(110.0, max(remaining() - 60.0, 20.0)))
        if ok or attempt == 1 or remaining() < 90.0:
            break
        print(f"[bench] probe attempt {attempt + 1} failed: {detail}; retrying",
              file=sys.stderr, flush=True)
    if not ok:
        _emit(
            "backend_unavailable",
            0.0,
            f"jax backend failed to initialize ({detail}); no numbers this run",
        )
        return 0

    # 2. Worker with streamed output + hard deadline.
    worker_budget = max(remaining() - 10.0, 5.0)
    proc = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--worker",
         "--deadline-s", f"{worker_budget:.0f}"] + argv,
        stdout=subprocess.PIPE,
        stderr=sys.stderr,
        text=True,
    )
    lines = []
    lock = threading.Lock()

    def reader():
        for raw in proc.stdout:
            raw = raw.rstrip("\n")
            try:
                rec = json.loads(raw)
            except (json.JSONDecodeError, ValueError):
                print(raw, file=sys.stderr, flush=True)
                continue
            with lock:
                lines.append(rec)
            print(raw, flush=True)

    t = threading.Thread(target=reader, daemon=True)
    t.start()
    killed = False
    try:
        proc.wait(timeout=max(remaining() - 10.0, 5.0))
    except subprocess.TimeoutExpired:
        killed = True
        proc.kill()  # exact PID, never a pattern
        proc.wait()
    t.join(timeout=5.0)

    # 3. The driver records a BOUNDED TAIL of stdout and parses the LAST
    # line. Re-emit EVERY completed section's metric in one compact block
    # here at the end — so the tail always contains the full metric set
    # even when the streamed copies above scrolled out of the bound — and
    # then the headline again as the final, parsed line. (Round 4's
    # official artifact lost the plain wide-bucket line to exactly this
    # truncation: VERDICT.md weak #1.)
    with lock:
        headline = next((r for r in lines if r.get("metric") == HEADLINE), None)
        got_any = bool(lines)
        summary = list(lines)
    why = "worker killed at deadline" if killed else f"worker rc={proc.returncode}"
    for rec in summary:
        if rec is not headline:
            print(json.dumps(rec, separators=(",", ":")), flush=True)
    if headline is not None:
        print(json.dumps(headline), flush=True)
    elif got_any and _headline_expected(argv):
        # Some sections produced numbers but the headline never did — say
        # so explicitly rather than leaving an arbitrary metric as the
        # final (driver-parsed) line.
        _emit(
            "headline_unavailable",
            0.0,
            f"{len(lines)} non-headline metrics above, but the headline "
            f"section never completed ({why})",
        )
    elif got_any:
        pass  # --task filtered the headline out on purpose; lines stand.
    else:
        _emit(
            "backend_unavailable",
            0.0,
            f"backend probe ok ({detail}) but worker emitted nothing ({why})",
        )
    return 0


# --------------------------------------------------------------------------
# Worker sections (run under the supervisor's deadline)
# --------------------------------------------------------------------------


class SectionTimeout(Exception):
    pass


# Steady-state timing policy (round 5). Every timed window on this
# tunnel-attached rig pays a fixed ~35 ms of dispatch-ramp + final-drain
# latency regardless of the step time inside it (measured: the identical
# wide train step times 24.7 ms/step in 15-iter windows, 23.5 in 30-iter,
# 23.0 in 60-iter — the differences back-solve to a constant ~36 ms per
# window). Production training pays that once per epoch, not once per 15
# steps, so short windows systematically under-report the trainer's
# steady-state throughput. Sections therefore size their windows so the
# fixed cost is ≲2% of the window, and take the best of several windows
# so a transient tunnel stall (multi-ms, occasional) degrades one window
# instead of the reported number. Methodology data: docs/rec_perf.md
# round-5 section.


def _alarm_handler(signum, frame):
    raise SectionTimeout()


def _init_on_cpu(fn, *args):
    """Run a (flax init / state construction) callable on the host CPU
    backend, then transfer the result to the default device in ONE
    device_put. Flax init traces eagerly op-by-op; on this image's axon
    tunnel each eager op is a network roundtrip, so initializing a model
    directly on the TPU costs ~65 s where CPU init + one transfer costs
    ~3 s (measured; the values are identical — same PRNG, same ops)."""
    import jax

    try:
        cpu = jax.devices("cpu")[0]
    except RuntimeError:
        return fn(*args)
    with jax.default_device(cpu):
        out = fn(*args)
    return jax.device_put(out, jax.devices()[0])


def _rec_batch(batch_size, width, max_chars=24, seed=0):
    import jax
    import numpy as np

    rng = np.random.default_rng(seed)
    batch = {
        "image": rng.uniform(-0.5, 0.5, (batch_size, 64, width, 1)).astype(
            np.float32
        ),
        "text": np.zeros((batch_size, 64), np.int32),
        "text_len": np.full((batch_size,), max_chars, np.int32),
        "image_width": np.full((batch_size,), width, np.int32),
        "sample_weight": np.ones((batch_size,), np.float32),
    }
    batch["text"][:, :max_chars] = rng.integers(1, 97, (batch_size, max_chars))
    return jax.device_put(batch)


def _make_rec():
    import jax
    import jax.numpy as jnp

    from ocrs_models_tpu.config import DEFAULT_ALPHABET
    from ocrs_models_tpu.models import RecognitionModel
    from ocrs_models_tpu.training.state import create_train_state
    from ocrs_models_tpu.training.steps import make_recognition_steps

    model = RecognitionModel(n_classes=len(DEFAULT_ALPHABET) + 1, dtype=jnp.bfloat16)
    state = _init_on_cpu(
        lambda: create_train_state(
            model, jax.random.key(0), jnp.zeros((1, 64, 64, 1)), grad_clip_norm=4.0
        )
    )
    train_step, _ = make_recognition_steps(model)
    return state, train_step, model


def bench_rec_headline(state, train_step):
    import jax.numpy as jnp

    batch = _rec_batch(256, 256)
    lr = jnp.float32(1e-3)
    for _ in range(3):
        state, metrics = train_step(state, batch, lr)
    float(metrics["loss"])
    n_iters = 200  # ~2.2 s/window: fixed window cost ~1.6% (policy above)
    best = float("inf")
    for _ in range(3):
        start = time.perf_counter()
        for _ in range(n_iters):
            state, metrics = train_step(state, batch, lr)
        float(metrics["loss"])
        best = min(best, time.perf_counter() - start)
    crops = 256 * n_iters / best
    _emit(HEADLINE, crops, "crops/sec/chip", crops / TARGET)
    return state


def bench_rec_wide(state, train_step):
    """W=1024 bucket (the hiertext.py W<=800 cap rounds up to 1024; T=257).
    Batch 128 is the measured throughput optimum (re-swept round 3 with
    the fused kernels: 144/160/192 all regress — docs/rec_perf.md).
    Steady-state throughput: best of three 120-iter (~2.8 s) windows
    (steady-state timing policy above; fixed window cost ~1.3%)."""
    import jax.numpy as jnp

    batch = _rec_batch(128, 1024, max_chars=48)
    lr = jnp.float32(1e-3)
    for _ in range(3):
        state, m = train_step(state, batch, lr)
    float(m["loss"])
    iters = 120
    best = float("inf")
    for _ in range(3):
        start = time.perf_counter()
        for _ in range(iters):
            state, m = train_step(state, batch, lr)
        float(m["loss"])
        best = min(best, time.perf_counter() - start)
    crops = 128 * iters / best
    _emit(
        "recognition_train_wide_w1024_crops_per_sec_per_chip",
        crops,
        "crops/sec/chip",
        crops / TARGET,
    )
    return state


def bench_rec_mixed(state, train_step):
    """Mixed-bucket epoch: 55% of crops in the 256 bucket, 30% in 512,
    15% in 1024 — batch sizes hold the pixel budget constant. Single
    timed pass (an epoch pays the dispatch ramp once, so including it
    once is epoch-faithful), sized ~1.4 s so it costs <3%."""
    import jax.numpy as jnp

    buckets = [(256, 256, 33), (512, 128, 36), (1024, 128, 18)]  # (W, batch, iters)
    batches = {w: _rec_batch(b, w, max_chars=min(24, w // 16)) for w, b, _ in buckets}
    lr = jnp.float32(1e-3)
    for w, b, _ in buckets:  # compile
        state, m = train_step(state, batches[w], lr)
        float(m["loss"])
    total_crops = 0
    start = time.perf_counter()
    for w, b, iters in buckets:
        for _ in range(iters):
            state, m = train_step(state, batches[w], lr)
        total_crops += b * iters
    float(m["loss"])
    elapsed = time.perf_counter() - start
    crops = total_crops / elapsed
    _emit(
        "recognition_train_mixed_epoch_crops_per_sec_per_chip",
        crops,
        "crops/sec/chip",
        crops / TARGET,
    )
    return state


def bench_rec_wide_ga(state, model):
    """Bonus shape: the W=1024 bucket trained with gradient accumulation
    (``grad_accum=4``: resident microbatch 128, effective batch 512 per
    optimizer step via a lax.scan inside the jitted step). The scan
    amortizes the per-step dispatch + optimizer work over 4 microbatches
    at unchanged activation memory — measured ~9% over the plain b128
    step (docs/training.md). Runs at the bench tail: on a cold-cache day
    the deadline sheds this bonus before the BASELINE-config sections."""
    import jax.numpy as jnp

    from ocrs_models_tpu.training.steps import make_recognition_steps

    train_step, _ = make_recognition_steps(model, grad_accum=4)
    batch = _rec_batch(512, 1024, max_chars=48)
    lr = jnp.float32(1e-3)
    for _ in range(2):
        state, m = train_step(state, batch, lr)
    float(m["loss"])
    iters = 25  # ~2.3 s/window, fixed cost ~1.6% (steady-state policy above)
    best = float("inf")
    for _ in range(3):
        start = time.perf_counter()
        for _ in range(iters):
            state, m = train_step(state, batch, lr)
        float(m["loss"])
        best = min(best, time.perf_counter() - start)
    crops = 512 * iters / best
    _emit(
        "recognition_train_wide_w1024_ga4_crops_per_sec_per_chip",
        crops,
        "crops/sec/chip (grad_accum=4: microbatch 128, effective batch 512)",
        crops / TARGET,
    )
    return state


def bench_detection(batch_size, grad_accum=1):
    """800x608 bf16 train step. With ``grad_accum=k`` the step scans k
    microbatches of ``batch_size`` (effective batch k*batch_size per
    optimizer step) — measured faster per image than the same effective
    batch resident (mb4 ga2 80.3 vs plain b8 70.8 img/s: the small-batch
    conv shapes tile better and the scan amortizes step overhead)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ocrs_models_tpu.models import DetectionModel
    from ocrs_models_tpu.training.state import create_train_state
    from ocrs_models_tpu.training.steps import make_detection_steps

    n, h, w = batch_size * grad_accum, 800, 608
    rng = np.random.default_rng(0)
    batch = jax.device_put(
        {
            "image": rng.uniform(-0.5, 0.5, (n, h, w, 1)).astype(np.float32),
            "mask": (rng.uniform(size=(n, h, w, 1)) > 0.9).astype(np.float32),
        }
    )
    model = DetectionModel(dtype=jnp.bfloat16)
    state = _init_on_cpu(
        lambda: create_train_state(
            model, jax.random.key(0), jnp.zeros((1, 128, 128, 1))
        )
    )
    step, _ = make_detection_steps(model, grad_accum=grad_accum)
    lr = jnp.float32(1e-3)
    state, m = step(state, batch, lr)
    float(m["loss"])
    # ~1.8-2.7 s/window at the measured step times -> fixed window cost
    # <=2% (steady-state timing policy above).
    iters = 36 if grad_accum == 1 else max(48 // grad_accum, 12)
    best = float("inf")
    for _ in range(2):
        start = time.perf_counter()
        for _ in range(iters):
            state, m = step(state, batch, lr)
        float(m["loss"])
        best = min(best, time.perf_counter() - start)
    elapsed = best
    suffix = f"_ga{grad_accum}" if grad_accum > 1 else ""
    unit = "images/sec/chip"
    if grad_accum > 1:
        unit += (
            f" (grad_accum={grad_accum}: microbatch {batch_size}, "
            f"effective batch {n})"
        )
    _emit(
        f"detection_train_images_per_sec_per_chip_b{batch_size}{suffix}",
        n * iters / elapsed,
        unit,
    )


def bench_layout():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ocrs_models_tpu.models import LayoutModel
    from ocrs_models_tpu.training.state import create_train_state
    from ocrs_models_tpu.training.steps import make_layout_steps

    n, n_words = 64, 500
    rng = np.random.default_rng(0)
    batch = jax.device_put(
        {
            "boxes": rng.uniform(0, 1000, (n, n_words, 4)).astype(np.float32),
            "labels": (rng.uniform(size=(n, n_words, 2)) > 0.8).astype(np.float32),
        }
    )
    model = LayoutModel(dtype=jnp.bfloat16)
    state = _init_on_cpu(
        lambda: create_train_state(model, jax.random.key(0), jnp.zeros((1, 32, 4)))
    )
    step, _ = make_layout_steps(model)
    lr = jnp.float32(3e-4)
    key = jax.random.key(1)
    state, m = step(state, batch, lr, key)
    float(m["loss"])
    iters = 45  # ~2 s/window, fixed cost <2% (steady-state policy above)
    best = float("inf")
    for _ in range(2):
        start = time.perf_counter()
        for _ in range(iters):
            state, m = step(state, batch, lr, key)
        float(m["loss"])
        best = min(best, time.perf_counter() - start)
    _emit(
        "layout_train_pages_per_sec_per_chip", n * iters / best, "pages/sec/chip"
    )


def bench_rec_infer():
    """BASELINE config #1: forward + on-device greedy CTC decode latency on
    ONE greyscale text-line crop (W=256), inference numerics (f32 GRU like
    the reference's fp32-pinned GRU island, models.py:264-266)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ocrs_models_tpu.config import DEFAULT_ALPHABET
    from ocrs_models_tpu.models import RecognitionModel
    from ocrs_models_tpu.utils.text import ctc_greedy_decode_batch

    model = RecognitionModel(n_classes=len(DEFAULT_ALPHABET) + 1)
    variables = _init_on_cpu(
        lambda: model.init(jax.random.key(0), jnp.zeros((1, 64, 64, 1)))
    )
    crop = jax.device_put(
        np.random.default_rng(0)
        .uniform(-0.5, 0.5, (1, 64, 256, 1))
        .astype(np.float32)
    )

    @jax.jit
    def infer(v, x):
        log_probs = model.apply(v, x, train=False)  # [1, T, C]
        ids = jnp.argmax(log_probs, axis=-1).astype(jnp.int32)
        lengths = jnp.full((x.shape[0],), x.shape[2] // 4, jnp.int32)
        return ctc_greedy_decode_batch(ids, lengths)

    decoded, dec_len = infer(variables, crop)
    int(dec_len[0])  # fence
    iters = 25
    best = float("inf")
    for _ in range(3):
        start = time.perf_counter()
        for _ in range(iters):
            decoded, dec_len = infer(variables, crop)
        int(dec_len[0])
        best = min(best, time.perf_counter() - start)
    _emit(
        "recognition_infer_single_crop_ms",
        best / iters * 1e3,
        "ms/crop (fwd + on-device greedy decode)",
    )


def bench_det_infer():
    """BASELINE config #2: 512x512 detection forward + postprocess to word
    boxes. Forward (+ device->host mask fetch) is timed on a synthetic page;
    postprocess (threshold -> CC quads -> expand, the C++ geometry path) is
    timed on that page's ground-truth mask so the box count is realistic
    (an untrained model's mask content would be degenerate). One combined
    ms/page line, components in the metric breakdown."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ocrs_models_tpu.data.synthetic import SyntheticDetection
    from ocrs_models_tpu.geometry import expand_quads, extract_cc_quads
    from ocrs_models_tpu.models import DetectionModel

    model = DetectionModel()
    variables = _init_on_cpu(
        lambda: model.init(jax.random.key(0), jnp.zeros((1, 128, 128, 1)))
    )
    ds = SyntheticDetection(size=1, page_size=(512, 512), seed=3)
    sample = ds[0]
    img = jax.device_put(sample["image"][None])

    @jax.jit
    def fwd(v, x):
        p = model.apply(v, x, train=False)
        return p, jnp.sum(p)

    def window(fn, iters=10, reps=3):
        best = float("inf")
        for _ in range(reps):
            start = time.perf_counter()
            for _ in range(iters):
                fn()
            best = min(best, (time.perf_counter() - start) / iters)
        return best

    probs, s = fwd(variables, img)
    float(s)
    # On-device forward latency (scalar fence). The full-mask device->host
    # fetch is reported separately: on this rig it crosses the axon
    # network tunnel (tens of ms); on production hardware it is a ~0.2 ms
    # PCIe copy, so it would misrepresent the chip to fold it in.
    t_fwd = window(lambda: float(fwd(variables, img)[1]))
    t_fetch = window(lambda: np.asarray(fwd(variables, img)[0]), iters=5)

    mask = sample["mask"][..., 0] > 0.5
    quads = expand_quads(extract_cc_quads(mask), dist=3.0)
    t_post = window(lambda: expand_quads(extract_cc_quads(mask), dist=3.0))
    _emit(
        "detection_infer_512_ms_per_page",
        (t_fwd + t_post) * 1e3,
        f"ms/page (device fwd {t_fwd*1e3:.1f} + postprocess {t_post*1e3:.1f}; "
        f"mask fetch via axon tunnel {t_fetch*1e3:.1f} excluded, "
        f"{len(quads)} boxes)",
    )


def run_worker(argv):
    _setup_jax_config()
    only = None
    if "--task" in argv:
        only = argv[argv.index("--task") + 1]
    # --warm: cache pre-warm mode — no watchdogs, no deadline. On a fresh
    # machine the 800x608 detection compiles can exceed their section
    # watchdog; the SIGALRM then aborts the compile BEFORE the persistent
    # cache entry is written, so the section can never self-heal. One
    # `python bench.py --warm` run lets every compile finish once (and
    # prints the numbers); all later runs hit .jax_cache and fit the
    # driver's budget comfortably.
    warm = "--warm" in argv
    deadline = None
    if "--deadline-s" in argv and not warm:
        deadline = time.monotonic() + float(argv[argv.index("--deadline-s") + 1])
    signal.signal(signal.SIGALRM, _alarm_handler)

    def guarded(name, fn, *args, timeout_s=150):
        """Returns (status, result): status is "ok", "skipped" (filter or
        deadline shed — the section never ran, its inputs are untouched)
        or "failed" (ran and died — donated buffers may be gone)."""
        if only is not None and only not in name:
            return "skipped", None
        if deadline is not None:
            left = deadline - time.monotonic()
            if left < 30.0:
                print(f"[bench] {name} skipped: {left:.0f}s left before the "
                      "global deadline", file=sys.stderr, flush=True)
                return "skipped", None
            timeout_s = int(min(timeout_s, left))
        if not warm:
            signal.alarm(timeout_s)
        try:
            return "ok", fn(*args)
        except SectionTimeout:
            print(f"[bench] {name} hit its {timeout_s}s watchdog; skipping",
                  file=sys.stderr, flush=True)
            return "failed", None
        except Exception:
            traceback.print_exc(file=sys.stderr)
            print(f"[bench] {name} failed; continuing", file=sys.stderr, flush=True)
            return "failed", None
        finally:
            signal.alarm(0)

    # Recognition training first — the headline must be the first thing
    # that can possibly print.
    state = train_step = rec_model = None
    headline_done = False
    if only is None or "rec" in only:
        try:
            state, train_step, rec_model = _make_rec()
        except Exception:
            traceback.print_exc(file=sys.stderr)
    if state is not None:
        # The headline gets a generous first watchdog (300 s, vs 150 for
        # ordinary sections): as the first section after a machine reset
        # it absorbs the backend ramp + executable (re)load, observed
        # exceeding 150 s while the rest of the same run was healthy
        # (round 5). If it still times out, retry IMMEDIATELY with the
        # long watchdog rather than only at the end of the run — the
        # end-of-run retry slot was observed being shed with 24 s of
        # budget left after a 150 s watchdog burn (round 5).
        status, new_state = guarded(
            "rec_headline", bench_rec_headline, state, train_step,
            timeout_s=300,
        )
        if status == "failed":
            try:
                # state may have been donated before the failure; rebuild.
                state, train_step, rec_model = _make_rec()
                status, new_state = guarded(
                    "rec_headline_retry_inline", bench_rec_headline, state,
                    train_step, timeout_s=420,
                )
                if status == "failed":
                    state, train_step, rec_model = _make_rec()
            except Exception:
                # A rebuild failure must not take the whole worker (and
                # every remaining section) down with it.
                traceback.print_exc(file=sys.stderr)
                state = None
        if status == "ok":
            state = new_state
            headline_done = True
    if state is not None:
        for name, fn in (
            ("rec_wide", bench_rec_wide),
            ("rec_mixed", bench_rec_mixed),
        ):
            status, new_state = guarded(name, fn, state, train_step)
            if status == "failed":
                try:
                    # state may have been donated pre-failure; rebuild.
                    state, train_step, rec_model = _make_rec()
                except Exception:
                    traceback.print_exc(file=sys.stderr)
                    state = None
                    break
            elif status == "ok":
                state = new_state

    # Remaining sections in order of evidentiary value (BASELINE.json
    # configs 4, 2, 1, then bonus shapes): on a slow-tunnel day the global
    # deadline sheds from the tail, not the head.
    guarded("det", bench_detection, 4, timeout_s=240)
    guarded("det_infer", bench_det_infer)
    guarded("rec_infer", bench_rec_infer)
    guarded("layout", bench_layout)
    guarded("det", bench_detection, 8, timeout_s=240)
    if state is not None and (only is None or "rec" in only):
        guarded("rec_wide_ga4", bench_rec_wide_ga, state, rec_model)
    guarded("det_ga4", bench_detection, 4, 4, timeout_s=240)

    # Last-chance headline retry (backstop behind the inline retry above,
    # for the case where BOTH early attempts were eaten by a stall that
    # later cleared). Two fixes over the naive re-call (round 5, observed
    # as back-to-back headline_unavailable runs):
    #  - rebuild the train state: the donate_argnums=0 steps consumed the
    #    loop's `state` buffers (rec_wide_ga4 donates internally and its
    #    final state is discarded), so reusing it dies with a TPU
    #    InvalidArgument on the first fetch;
    #  - a LONGER watchdog: the first attempt's alarm fired mid-compile,
    #    BEFORE the persistent-cache write, so the retry faces the same
    #    cold compile and a same-budget retry dies identically. 420s lets
    #    the compile finish and write its cache entry; the global
    #    deadline still caps it.
    if state is not None and not headline_done and (only is None or "rec" in only):
        try:
            state, train_step, rec_model = _make_rec()
        except Exception:
            traceback.print_exc(file=sys.stderr)
            state = None
    if state is not None and not headline_done and (only is None or "rec" in only):
        guarded(
            "rec_headline_retry", bench_rec_headline, state, train_step,
            timeout_s=420,
        )
    return 0


def main():
    argv = sys.argv[1:]
    if "--worker" in argv:
        argv.remove("--worker")
        return run_worker(argv)
    if "--warm" in argv:
        # Cache pre-warm: run the worker in-process, unbudgeted and
        # unwatched, so every cold compile completes and persists. Probe
        # the backend first (bounded, in a throwaway subprocess): a wedged
        # axon backend then fails loudly with a diagnostic instead of
        # hanging the warm run indefinitely (advisor finding, round 4).
        ok, detail = probe_backend(timeout_s=float(
            os.environ.get("BENCH_WARM_PROBE_TIMEOUT_S", "180")
        ))
        if not ok:
            _emit(
                "backend_unavailable",
                0.0,
                f"warm-run backend probe failed ({detail}); not warming",
            )
            return 1
        return run_worker(argv)
    return supervise(argv)


if __name__ == "__main__":
    sys.exit(main())
