import jax.numpy as jnp
import numpy as np
import pytest

from pysgmcmc_tpu.diagnostics.sample_chains import (
    MultiTrace,
    PYSGMCMCTrace,
    pysgmcmc_multitrace,
)
from pysgmcmc_tpu.samplers.sghmc import SGHMCSampler


def _dummy_trace(n=10, chain_id=0):
    samples = {"a": jnp.arange(n, dtype=jnp.float32),
               "b": jnp.arange(2 * n, dtype=jnp.float32).reshape(n, 2)}
    return PYSGMCMCTrace(chain_id, samples, varnames=["a", "b"])


def test_trace_get_values_burn_thin():
    trace = _dummy_trace(10)
    np.testing.assert_array_equal(
        trace.get_values("a", burn=2, thin=3), np.asarray([2.0, 5.0, 8.0])
    )
    assert trace.get_values("b").shape == (10, 2)


def test_trace_point_and_len():
    trace = _dummy_trace(7)
    assert len(trace) == 7
    point = trace.point(3)
    assert point["a"] == 3.0
    np.testing.assert_array_equal(point["b"], [6.0, 7.0])


def test_trace_slice():
    trace = _dummy_trace(10)
    sliced = trace[2:6]
    assert len(sliced) == 4
    np.testing.assert_array_equal(sliced.get_values("a"), [2.0, 3.0, 4.0, 5.0])


def test_trace_unknown_varname():
    trace = _dummy_trace()
    with pytest.raises(ValueError):
        trace.get_values("nope")


def test_trace_auto_varnames():
    trace = PYSGMCMCTrace(0, [jnp.zeros(5), jnp.ones(5)])
    assert trace.varnames == ["x_0", "x_1"]
    single = PYSGMCMCTrace(0, jnp.zeros(5))
    assert single.varnames == ["x"]


def test_from_sampler():
    cost_fn = lambda x: 0.5 * jnp.sum(x**2)
    sampler = SGHMCSampler(cost_fn, burn_in_steps=10)
    trace = PYSGMCMCTrace.from_sampler(
        chain_id=0,
        sampler=sampler,
        initial_position=jnp.zeros(2),
        n_samples=25,
        key=0,
        keep_every=4,
        varnames=["theta"],
    )
    assert len(trace) == 25
    assert trace.get_values("theta").shape == (25, 2)


def test_multitrace_parallel_chains():
    cost_fn = lambda x: 0.5 * jnp.sum(x**2)
    sampler = SGHMCSampler(cost_fn, stepsize_schedule=0.05, burn_in_steps=50)
    multitrace = pysgmcmc_multitrace(
        sampler,
        jnp.zeros(2),
        key=0,
        n_chains=3,
        samples_per_chain=40,
        keep_every=2,
        varnames=["theta"],
    )
    assert multitrace.nchains == 3
    assert len(multitrace) == 40
    combined = multitrace.get_values("theta")
    assert combined.shape == (120, 2)
    per_chain = multitrace.get_values("theta", combine=False)
    assert len(per_chain) == 3
    # chains must differ (distinct keys)
    assert not np.allclose(per_chain[0], per_chain[1])
    stacked = multitrace.chains_array("theta")
    assert stacked.shape == (3, 40, 2)
