"""ArviZ export: InferenceData layout + round trip.

Analog of the reference's pymc3 MultiTrace interop tests
(``/root/reference/pysgmcmc/diagnostics/sample_chains.py:338-384`` is its
ecosystem bridge); the dict layout is pinned without arviz installed (this
image does not ship it), the real ``InferenceData`` round trip runs when it
is available (``pytest.importorskip``).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pysgmcmc_tpu.diagnostics import to_arviz, to_inference_dict
from pysgmcmc_tpu.diagnostics.sample_chains import (
    MultiTrace,
    PYSGMCMCTrace,
    pysgmcmc_multitrace,
)
from pysgmcmc_tpu.diagnostics.objective_functions import (
    gmm1_log_likelihood,
    to_negative_log_likelihood,
)
from pysgmcmc_tpu.parallel.chains import run_chains
from pysgmcmc_tpu.samplers.sghmc import SGHMCSampler


def _run(n_chains=3, n_draws=8):
    cost_fn = to_negative_log_likelihood(gmm1_log_likelihood)
    sampler = SGHMCSampler(
        cost_fn, stepsize_schedule=0.05, burn_in_steps=4)
    positions = jnp.linspace(-1.0, 1.0, n_chains).reshape(n_chains, 1)
    chains, costs = run_chains(
        sampler, positions, jax.random.PRNGKey(0), n_draws, keep_every=2)
    return chains, costs


def test_inference_dict_from_run_chains():
    """Raw vmapped histories -> (chain, draw, *shape) posterior + lp."""
    n_chains, n_draws = 3, 8
    chains, costs = _run(n_chains, n_draws)
    d = to_inference_dict(chains, costs=costs)
    assert set(d) == {"posterior", "sample_stats"}
    assert d["posterior"]["x"].shape == (n_chains, n_draws, 1)
    assert d["sample_stats"]["lp"].shape == (n_chains, n_draws)
    # lp is the NEGATED cost, bit-exact
    np.testing.assert_array_equal(
        d["sample_stats"]["lp"], -np.asarray(costs))
    assert np.isfinite(d["posterior"]["x"]).all()


def test_inference_dict_from_traces():
    """MultiTrace and single-trace sources agree with the raw layout."""
    cost_fn = to_negative_log_likelihood(gmm1_log_likelihood)
    sampler = SGHMCSampler(cost_fn, stepsize_schedule=0.05, burn_in_steps=4)
    mt = pysgmcmc_multitrace(
        sampler, jnp.zeros(1), 0, n_chains=2, samples_per_chain=6,
        keep_every=2, jitter=0.1, varnames=["x"])
    d = to_inference_dict(mt)
    assert d["posterior"]["x"].shape == (2, 6, 1)
    np.testing.assert_array_equal(
        d["posterior"]["x"][1], mt.traces[1].get_values("x"))

    single = to_inference_dict(mt.traces[0])
    assert single["posterior"]["x"].shape == (1, 6, 1)
    np.testing.assert_array_equal(
        single["posterior"]["x"][0], mt.traces[0].get_values("x"))


def test_inference_dict_validation():
    with pytest.raises(ValueError, match="n_chains, n_draws"):
        to_inference_dict({"w": np.zeros(5)})
    with pytest.raises(ValueError, match="disagree"):
        to_inference_dict(
            {"a": np.zeros((2, 5)), "b": np.zeros((3, 5))})
    with pytest.raises(ValueError, match="costs shape"):
        to_inference_dict(
            {"a": np.zeros((2, 5))}, costs=np.zeros((2, 4)))
    with pytest.raises(ValueError, match="no posterior"):
        to_inference_dict([])
    # anonymous pytree enumeration mirrors PYSGMCMCTrace naming
    d = to_inference_dict([np.zeros((2, 5)), np.ones((2, 5))])
    assert set(d["posterior"]) == {"x_0", "x_1"}
    # attrs pass through
    d = to_inference_dict({"w": np.zeros((2, 5))}, attrs={"sampler": "sghmc"})
    assert d["attrs"] == {"sampler": "sghmc"}


def test_to_arviz_missing_dependency_message():
    """Without arviz installed, to_arviz raises a pointer to the fallback."""
    try:
        import arviz  # noqa: F401
    except ImportError:
        with pytest.raises(ImportError, match="to_inference_dict"):
            to_arviz({"w": np.zeros((2, 5))})
    else:
        pytest.skip("arviz installed; covered by the round-trip test")


def test_to_arviz_round_trip():
    """With arviz available: a real InferenceData with matching values."""
    arviz = pytest.importorskip("arviz")
    chains, costs = _run(2, 6)
    idata = to_arviz(chains, costs=costs, attrs={"sampler": "sghmc"})
    assert isinstance(idata, arviz.InferenceData)
    post = np.asarray(idata.posterior["x"])
    np.testing.assert_array_equal(
        post, np.asarray(jax.tree_util.tree_leaves(chains)[0]))
    assert np.asarray(idata.sample_stats["lp"]).shape == (2, 6)
