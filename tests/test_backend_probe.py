"""utils/backend.py (bounded backend probe) + bench.py supervisor helpers.

These are the pieces that keep a wedged TPU runtime from silently eating
a round (the BENCH_r03 failure mode), so their edge cases get direct
coverage: skip conditions, platform pinning, timeout/diagnostic paths,
and the supervisor's headline-expectation filter.
"""

import importlib.util
import json
from pathlib import Path

import pytest

from ocrs_models_tpu.utils.backend import (
    BackendUnavailableError,
    ensure_backend,
)

REPO = Path(__file__).resolve().parents[1]


def _load_bench():
    spec = importlib.util.spec_from_file_location("_bench_mod", REPO / "bench.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_probe_skipped_by_env(monkeypatch):
    monkeypatch.setenv("OCRS_TPU_BACKEND_PROBE", "0")
    assert ensure_backend() is None


def test_probe_skipped_when_backend_live(monkeypatch):
    import jax

    jax.devices()  # initialize the (conftest-pinned CPU) backend
    monkeypatch.setenv("OCRS_TPU_BACKEND_PROBE", "1")
    assert ensure_backend() is None


def test_forced_probe_with_cpu_platform(monkeypatch):
    """force=True probes even with the opt-out set; platform='cpu' pins
    the subprocess to the host backend (the env var would be ignored
    under this image's sitecustomize)."""
    monkeypatch.setenv("OCRS_TPU_BACKEND_PROBE", "0")
    assert ensure_backend(timeout_s=120.0, platform="cpu", force=True) == "cpu"


def test_hang_produces_diagnostic(monkeypatch):
    """A probe that cannot finish inside the timeout raises with a
    diagnosable message instead of blocking forever."""
    import ocrs_models_tpu.utils.backend as backend_mod

    monkeypatch.setattr(
        backend_mod,
        "_PROBE_SRC",
        "import time; time.sleep(60)",
    )
    with pytest.raises(BackendUnavailableError, match="hung"):
        backend_mod.ensure_backend(timeout_s=1.0, force=True)


def test_failure_produces_diagnostic(monkeypatch):
    import ocrs_models_tpu.utils.backend as backend_mod

    monkeypatch.setattr(
        backend_mod,
        "_PROBE_SRC",
        "raise RuntimeError('tunnel on fire')",
    )
    with pytest.raises(BackendUnavailableError, match="tunnel on fire"):
        backend_mod.ensure_backend(timeout_s=30.0, force=True)


class TestBenchSupervisorHelpers:
    def test_headline_expected_mirrors_worker_filter(self):
        bench = _load_bench()
        # No filter: headline runs.
        assert bench._headline_expected([])
        # Substring filters that match the rec_headline section name.
        assert bench._headline_expected(["--task", "rec"])
        assert bench._headline_expected(["--task", "rec_headline"])
        # Filters that select OTHER sections must not claim a headline.
        assert not bench._headline_expected(["--task", "rec_infer"])
        assert not bench._headline_expected(["--task", "det"])
        assert not bench._headline_expected(["--task", "layout"])

    def test_probe_backend_reports_failure(self, monkeypatch):
        bench = _load_bench()
        util = bench._backend_util()
        monkeypatch.setattr(util, "_PROBE_SRC", "raise SystemExit(3)")
        monkeypatch.setattr(bench, "_backend_util", lambda: util)
        ok, detail = bench.probe_backend(30.0)
        assert not ok and detail

    def test_probe_backend_ok_on_cpu(self, monkeypatch):
        bench = _load_bench()
        monkeypatch.setenv("BENCH_FORCE_CPU", "1")
        ok, detail = bench.probe_backend(120.0)
        assert ok and "cpu" in detail

    def test_supervisor_reemits_full_metric_set_in_tail(
        self, monkeypatch, capsys
    ):
        """The driver records a BOUNDED TAIL of stdout and parses the last
        line. supervise() must therefore re-emit EVERY completed metric in
        one compact block at the very end, headline last — round 4 lost
        the plain wide-bucket metric to exactly this truncation."""
        import io

        bench = _load_bench()
        metrics = [
            {"metric": bench.HEADLINE, "value": 1.0, "unit": "x",
             "vs_baseline": None},
            {"metric": "recognition_train_wide_w1024_crops_per_sec_per_chip",
             "value": 2.0, "unit": "x", "vs_baseline": None},
            {"metric": "detection_train_images_per_sec_per_chip",
             "value": 3.0, "unit": "x", "vs_baseline": None},
        ]
        worker_out = "".join(json.dumps(m) + "\n" for m in metrics)

        class FakeProc:
            stdout = io.StringIO(worker_out)
            returncode = 0

            def wait(self, timeout=None):
                return 0

            def kill(self):
                pass

        monkeypatch.setattr(bench, "probe_backend", lambda t: (True, "fake"))
        monkeypatch.setattr(
            bench.subprocess, "Popen", lambda *a, **k: FakeProc()
        )
        assert bench.supervise([]) == 0
        out_lines = capsys.readouterr().out.strip().splitlines()
        # Tail contract: the last len(metrics) lines contain every metric
        # exactly, with the headline as the final (driver-parsed) line.
        tail = [json.loads(l) for l in out_lines[-len(metrics):]]
        assert {t["metric"] for t in tail} == {m["metric"] for m in metrics}
        assert tail[-1]["metric"] == bench.HEADLINE
        assert tail[-1]["value"] == 1.0

    def test_supervisor_kill_at_deadline_still_emits_clean_tail(
        self, monkeypatch, capsys
    ):
        """A worker that outlives the global budget is killed by exact
        PID, and the supervisor still ends with a parseable tail: the
        completed metrics re-emitted and the headline (captured before
        the kill) as the final line. Observed for real in round 5 when a
        CPU-starved worker was killed after the rec sections."""
        import io
        import subprocess as _subprocess

        bench = _load_bench()
        metrics = [
            {"metric": bench.HEADLINE, "value": 5.0, "unit": "x",
             "vs_baseline": None},
            {"metric": "recognition_train_wide_w1024_crops_per_sec_per_chip",
             "value": 6.0, "unit": "x", "vs_baseline": None},
        ]
        worker_out = "".join(json.dumps(m) + "\n" for m in metrics)

        class HungProc:
            stdout = io.StringIO(worker_out)
            returncode = -9
            killed = False

            def wait(self, timeout=None):
                if not self.killed:
                    raise _subprocess.TimeoutExpired("worker", timeout)
                return -9

            def kill(self):
                self.killed = True

        monkeypatch.setattr(bench, "probe_backend", lambda t: (True, "fake"))
        monkeypatch.setattr(
            bench.subprocess, "Popen", lambda *a, **k: HungProc()
        )
        assert bench.supervise([]) == 0
        out_lines = capsys.readouterr().out.strip().splitlines()
        tail = [json.loads(l) for l in out_lines[-len(metrics):]]
        assert {t["metric"] for t in tail} == {m["metric"] for m in metrics}
        assert tail[-1]["metric"] == bench.HEADLINE

    def test_warm_mode_ignores_deadline_and_alarms(self, monkeypatch):
        """--warm must run unbudgeted: an already-expired --deadline-s and
        a zero section watchdog would shed/kill every section in normal
        mode; in warm mode the (fully filtered-out) worker still exits 0
        without ever arming SIGALRM."""
        import signal as _signal

        bench = _load_bench()
        monkeypatch.setenv("BENCH_FORCE_CPU", "1")
        armed = []
        monkeypatch.setattr(
            bench.signal, "alarm", lambda s: armed.append(s) or 0
        )
        # run_worker installs its own SIGALRM handler; save the pre-test
        # handler and restore it in finally so a failing assertion cannot
        # leak bench's handler into later tests in this process.
        prev_handler = _signal.getsignal(_signal.SIGALRM)
        try:
            rc = bench.run_worker(
                ["--warm", "--task", "zzz-no-section", "--deadline-s", "0"]
            )
            assert rc == 0
            assert armed == []
        finally:
            _signal.signal(_signal.SIGALRM, prev_handler)

    def _run_headline_retry_scenario(self, monkeypatch, fail_first_n):
        """Drive run_worker with a fake headline section that times out on
        its first ``fail_first_n`` calls, recording state rebuilds and
        armed watchdogs."""
        import signal as _signal

        bench = _load_bench()
        monkeypatch.setenv("BENCH_FORCE_CPU", "1")

        makes, headline_states, armed = [], [], []

        def fake_make_rec():
            token = object()
            makes.append(token)
            return token, "train-step", "model"

        def fake_headline(state, step):
            headline_states.append(state)
            if len(headline_states) <= fail_first_n:
                raise bench.SectionTimeout()
            return state

        monkeypatch.setattr(
            bench.signal, "alarm", lambda s: armed.append(s) or 0
        )
        monkeypatch.setattr(bench, "_make_rec", fake_make_rec)
        monkeypatch.setattr(bench, "bench_rec_headline", fake_headline)
        monkeypatch.setattr(bench, "bench_rec_wide", lambda st, ts: st)
        monkeypatch.setattr(bench, "bench_rec_mixed", lambda st, ts: st)
        monkeypatch.setattr(bench, "bench_rec_infer", lambda: None)
        monkeypatch.setattr(bench, "bench_rec_wide_ga", lambda st, m: None)

        prev_handler = _signal.getsignal(_signal.SIGALRM)
        try:
            rc = bench.run_worker(["--task", "rec"])
        finally:
            _signal.signal(_signal.SIGALRM, prev_handler)
        assert rc == 0
        return makes, headline_states, armed

    def test_headline_inline_retry_rebuilds_state_with_long_watchdog(
        self, monkeypatch
    ):
        """A timed-out first headline attempt must be retried IMMEDIATELY
        (round 5 observed the end-of-run slot shed at 24s of budget left)
        with (a) a rebuilt train state — the donate_argnums=0 step
        consumed the first attempt's buffers (observed as a TPU
        InvalidArgument on the retry's first fetch) — and (b) a LONGER
        watchdog: the first alarm fires mid-compile BEFORE the
        persistent-cache write, so a same-budget retry dies identically."""
        makes, headline_states, armed = self._run_headline_retry_scenario(
            monkeypatch, fail_first_n=1
        )
        # Initial build + rebuild for the inline retry; no end-of-run
        # attempt once the inline retry lands the headline.
        assert len(makes) == 2
        assert len(headline_states) == 2
        assert headline_states[1] is makes[1]
        # First attempt: generous 300s (post-reset ramp); retry: 420s.
        assert 300 in armed and 420 in armed

    def test_headline_end_of_run_backstop_after_two_failures(
        self, monkeypatch
    ):
        """If the inline retry ALSO times out (stall that clears late),
        the end-of-run backstop still rebuilds state and lands the
        headline as the run's last act."""
        makes, headline_states, armed = self._run_headline_retry_scenario(
            monkeypatch, fail_first_n=2
        )
        # Initial + rebuild after attempt 1 + rebuild after the inline
        # retry + fresh build for the end-of-run backstop.
        assert len(makes) == 4
        assert len(headline_states) == 3
        assert headline_states[2] is makes[3]
        assert 300 in armed and armed.count(420) >= 2
