import logging

import jax
import pytest
import jax.numpy as jnp

from pysgmcmc_tpu.utils.profiling import StepTimer, log_progress, trace


def test_step_timer():
    step = jax.jit(lambda: jnp.ones((64, 64)) @ jnp.ones((64, 64)))
    best = StepTimer().measure(step, n_warmup=1, n_repeats=2)
    assert best > 0.0


@pytest.mark.slow
def test_trace_writes_profile(tmp_path):
    with trace(tmp_path):
        jax.block_until_ready(jnp.ones((16, 16)) * 2)
    produced = list(tmp_path.rglob("*"))
    assert produced, "profiler produced no trace files"


def test_log_progress(caplog):
    with caplog.at_level(logging.INFO):
        log_progress(0, 1.23, start_time=0.0, every=1)
        log_progress(512, 0.5, start_time=0.0, n_samples=3, every=512)
    assert any("Iter" in record.message for record in caplog.records)
