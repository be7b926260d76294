.PHONY: test qa checkformat lint typecheck bench

test:
	python -m pytest tests/ -x -q

# QA parity with the reference's `make qa` (ruff + mypy). Missing tools are
# a hard failure (the reference's CI enforces these, ci.yml:28-30); set
# QA_ALLOW_MISSING=1 to downgrade to a warning on images without them.
qa: checkformat lint typecheck

checkformat:
	@if command -v ruff >/dev/null 2>&1; then ruff format --check ocrs_models_tpu tests; \
	elif [ -n "$$QA_ALLOW_MISSING" ]; then echo "WARNING: ruff not installed; format check skipped"; \
	else echo "ERROR: ruff not installed (set QA_ALLOW_MISSING=1 to skip)"; exit 1; fi

lint:
	@if command -v ruff >/dev/null 2>&1; then ruff check ocrs_models_tpu tests; \
	elif [ -n "$$QA_ALLOW_MISSING" ]; then echo "WARNING: ruff not installed; lint skipped"; \
	else echo "ERROR: ruff not installed (set QA_ALLOW_MISSING=1 to skip)"; exit 1; fi

typecheck:
	@if command -v mypy >/dev/null 2>&1; then mypy ocrs_models_tpu; \
	elif [ -n "$$QA_ALLOW_MISSING" ]; then echo "WARNING: mypy not installed; typecheck skipped"; \
	else echo "ERROR: mypy not installed (set QA_ALLOW_MISSING=1 to skip)"; exit 1; fi

bench:
	python bench.py
