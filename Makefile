.PHONY: test qa checkformat lint typecheck bench

test:
	python -m pytest tests/ -x -q

# QA parity with the reference's `make qa` (ruff + mypy); tools are gated on
# availability since the bench image ships neither.
qa: checkformat lint typecheck

checkformat:
	@command -v ruff >/dev/null 2>&1 && ruff format --check ocrs_models_tpu tests || echo "ruff not installed; skipping format check"

lint:
	@command -v ruff >/dev/null 2>&1 && ruff check ocrs_models_tpu tests || echo "ruff not installed; skipping lint"

typecheck:
	@command -v mypy >/dev/null 2>&1 && mypy ocrs_models_tpu || echo "mypy not installed; skipping typecheck"

bench:
	python bench.py
