# Development targets (counterpart of the reference's Makefile:
# /root/reference/pysgmcmc/Makefile — test/doc/notebook targets).

PYTEST ?= python -m pytest

.PHONY: test test-fast examples bench clean

test:
	$(PYTEST) tests/ -q

test-fast:
	$(PYTEST) tests/ -q -x --ignore=tests/models

# Executable documentation (the reference runs its notebooks via nbval).
# PYTHONPATH=. drops the TPU-plugin site dir so JAX_PLATFORMS=cpu holds.
examples:
	PYTHONPATH=. JAX_PLATFORMS=cpu python examples/api_quickstart.py
	PYTHONPATH=. JAX_PLATFORMS=cpu python examples/svgd_mixture.py
	PYTHONPATH=. JAX_PLATFORMS=cpu python examples/relativistic_sghmc_banana.py
	PYTHONPATH=. JAX_PLATFORMS=cpu python examples/bnn_sinc.py

bench:
	python bench.py

clean:
	find . -name __pycache__ -type d -exec rm -rf {} +
	rm -rf .pytest_cache
