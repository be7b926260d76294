"""utils/backend.py (bounded backend probe) + bench.py supervisor helpers.

These are the pieces that keep a wedged TPU runtime from silently eating
a round (the BENCH_r03 failure mode), so their edge cases get direct
coverage: skip conditions, platform pinning, timeout/diagnostic paths,
and the supervisor's headline-expectation filter.
"""

import importlib.util
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
        rc = bench.run_worker(
            ["--warm", "--task", "zzz-no-section", "--deadline-s", "0"]
        )
        assert rc == 0
        assert armed == []
        # run_worker installs its handler; restore the default so later
        # tests in this process aren't affected.
        _signal.signal(_signal.SIGALRM, _signal.SIG_DFL)
