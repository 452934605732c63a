"""Test configuration: run the suite on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI, so sharding tests run
against 8 virtual CPU devices (the standard JAX recipe for testing
``Mesh``/``pjit`` code without a real pod slice).

Note: this environment registers a tunneled TPU PJRT plugin ("axon") from
``sitecustomize`` and pins ``JAX_PLATFORMS`` in the parent env, so setting
the env var alone is not enough — we must also override the config after
importing jax, before any backend is initialized.
"""

import os
import sys

if os.environ.get("PYSGMCMC_COVERAGE"):
    # Statement coverage via ci/coverage.py (the reference CI's --cov
    # analog; see that module's docstring).  Started before any
    # pysgmcmc_tpu import so import-time lines count.
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "ci"))
    import coverage as _pysgmcmc_coverage

    _pysgmcmc_coverage.start(
        os.path.join(os.path.dirname(__file__), "..", "pysgmcmc_tpu")
    )

    def pytest_sessionfinish(session, exitstatus):
        results = _pysgmcmc_coverage.collect(
            os.path.join(os.path.dirname(__file__), "..", "pysgmcmc_tpu")
        )
        out = os.environ.get("PYSGMCMC_COVERAGE_JSON", ".coverage.json")
        _pysgmcmc_coverage.write_json(results, out)
        _pysgmcmc_coverage.report(results)


_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

assert jax.default_backend() == "cpu", (
    "tests must run on CPU, got {}".format(jax.default_backend())
)
assert len(jax.devices()) == 8, (
    "expected 8 virtual CPU devices, got {}".format(len(jax.devices()))
)


import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _flush_jax_effects():
    """Drain pending io_callbacks after every test.

    Mosaic's interpret-mode pallas execution dispatches through ordered
    io_callbacks on a background thread; without a barrier the thread can
    still be mid-callback when the next test starts tracing, deadlocking
    the suite (observed ~30% of runs at test_svgd_streaming, stacks show
    interpret_pallas_call's io_callback blocked against the main thread).
    """
    yield
    jax.effects_barrier()
