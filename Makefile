.PHONY: test test-fast qa checkformat lint typecheck bench

test:
	python -m pytest tests/ -x -q

# Pre-commit tier: skips the @pytest.mark.slow tests (full-res parity,
# mesh trainer epochs, kernel grad sweeps) — ~4 min vs ~15 for `test`.
test-fast:
	python -m pytest tests/ -x -q -m "not slow"

# QA parity with the reference's `make qa` (ruff + mypy, ci.yml:28-30).
# Missing tools HARD-FAIL by default (matching the reference CI's
# enforced gate); set QA_ALLOW_MISSING=1 to degrade to warnings, in which
# case lint still runs the first-party stdlib checker (tools/qa_lint.py:
# syntax + unused imports) so `qa` always executes a real check.
qa: checkformat lint typecheck

checkformat:
	@if command -v ruff >/dev/null 2>&1; then ruff format --check ocrs_models_tpu tests; \
	elif [ "$(QA_ALLOW_MISSING)" = "1" ]; then echo "WARNING: ruff not installed; format check skipped"; \
	else echo "ERROR: ruff not installed (set QA_ALLOW_MISSING=1 to skip)"; exit 1; fi

lint:
	@if command -v ruff >/dev/null 2>&1; then ruff check ocrs_models_tpu tests; \
	else python tools/qa_lint.py ocrs_models_tpu tests tools bench.py __graft_entry__.py; fi

typecheck:
	@if command -v mypy >/dev/null 2>&1; then mypy ocrs_models_tpu; \
	elif [ "$(QA_ALLOW_MISSING)" = "1" ]; then echo "WARNING: mypy not installed; typecheck skipped"; \
	else echo "ERROR: mypy not installed (set QA_ALLOW_MISSING=1 to skip)"; exit 1; fi

bench:
	python bench.py
