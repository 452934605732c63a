"""Reflection-factory tests (counterpart of the reference's
``tests/test_sampling.py`` plus its ``sampling.py`` doctest error paths,
``/root/reference/pysgmcmc/sampling.py:88-273``): every enum member is
constructible through ``get_sampler``, and the descriptive ``ValueError``
paths for unknown kwargs, missing required parameters and unknown
methods all fire.
"""

import jax.numpy as jnp
import pytest

from pysgmcmc_tpu.sampling import Sampler


def cost_fn(params):
    return jnp.sum(params**2)


EXPECTED_CLASS = {
    Sampler.SGHMC: "SGHMCSampler",
    Sampler.SGLD: "SGLDSampler",
    Sampler.RelativisticSGHMC: "RelativisticSGHMCSampler",
    Sampler.SVGD: "SVGDSampler",
    Sampler.PSGLD: "PSGLDSampler",
    Sampler.SGNHT: "SGNHTSampler",
}


@pytest.mark.parametrize("method", list(Sampler))
def test_every_member_constructible(method):
    sampler = Sampler.get_sampler(method, cost_fn=cost_fn)
    assert type(sampler).__name__ == EXPECTED_CLASS[method]


@pytest.mark.parametrize("method", list(Sampler))
def test_every_member_supported(method):
    # unlike the reference (is_supported True only for SGHMC/SGLD,
    # sampling.py:64), every member can drive model training
    assert Sampler.is_supported(method)


def test_burn_in_predicate_exact():
    burn_in = {m for m in Sampler if Sampler.is_burn_in_mcmc(m)}
    assert burn_in == {Sampler.SGHMC, Sampler.SGLD}


@pytest.mark.parametrize("method", list(Sampler))
def test_unknown_kwarg_raises_with_valid_params_listed(method):
    with pytest.raises(ValueError) as excinfo:
        Sampler.get_sampler(method, cost_fn=cost_fn, bogus_argument=1)
    message = str(excinfo.value)
    assert "bogus_argument" in message
    # the error enumerates the sampler's real parameters
    assert "cost_fn" in message
    assert "stepsize_schedule" in message


@pytest.mark.parametrize("method", list(Sampler))
def test_missing_required_param_raises(method):
    with pytest.raises(ValueError) as excinfo:
        Sampler.get_sampler(method)
    assert "cost_fn" in str(excinfo.value)


def test_unknown_method_raises():
    with pytest.raises(ValueError) as excinfo:
        Sampler.get_sampler("not-a-method", cost_fn=cost_fn)
    assert "unknown sampling method" in str(excinfo.value)


def test_hyperparameters_forwarded():
    sampler = Sampler.get_sampler(
        Sampler.SGHMC, cost_fn=cost_fn, mdecay=0.123, burn_in_steps=7
    )
    assert sampler.mdecay == 0.123
    assert sampler.burn_in_steps == 7
