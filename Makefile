.PHONY: test qa checkformat lint typecheck bench

test:
	python -m pytest tests/ -x -q

# QA parity with the reference's `make qa` (ruff + mypy, ci.yml:28-30).
# On images without those tools, lint falls back to the first-party
# stdlib checker (tools/qa_lint.py: syntax + unused imports) so `qa`
# always executes a real check; format/typecheck warn when absent.
qa: checkformat lint typecheck

checkformat:
	@if command -v ruff >/dev/null 2>&1; then ruff format --check ocrs_models_tpu tests; \
	else echo "WARNING: ruff not installed; format check skipped (lint falls back to tools/qa_lint.py)"; fi

lint:
	@if command -v ruff >/dev/null 2>&1; then ruff check ocrs_models_tpu tests; \
	else python tools/qa_lint.py ocrs_models_tpu tests tools bench.py __graft_entry__.py; fi

typecheck:
	@if command -v mypy >/dev/null 2>&1; then mypy ocrs_models_tpu; \
	else echo "WARNING: mypy not installed; typecheck skipped (lint falls back to tools/qa_lint.py)"; fi

bench:
	python bench.py
