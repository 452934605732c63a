"""Hyperparameter fuzzing: random valid configurations must stay finite.

Extends the reference's ctor-level invalid-input fuzzing
(``tests/bayesian_neural_network/test_invalid_inputs.py``) to the numeric
level: samplers across a broad random hyperparameter range may mix poorly
but must never produce NaN/inf on a well-conditioned quadratic target.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    HAS_HYPOTHESIS = True
except ImportError:  # pragma: no cover
    HAS_HYPOTHESIS = False

from pysgmcmc_tpu.samplers import (
    PSGLDSampler,
    RelativisticSGHMCSampler,
    SGHMCSampler,
    SGLDSampler,
    sample_chain,
)

pytestmark = pytest.mark.slow

COST = lambda x: 0.5 * jnp.sum(x**2)


def _finite_chain(sampler, key_seed=0):
    state = sampler.init(jnp.asarray([0.3, -0.2]), key=jax.random.PRNGKey(9))
    _, positions, costs = sample_chain(
        sampler, state, jax.random.PRNGKey(key_seed), 100
    )
    assert np.isfinite(np.asarray(positions)).all()
    assert np.isfinite(np.asarray(costs)).all()


if HAS_HYPOTHESIS:

    @settings(max_examples=10, deadline=None)
    @given(
        stepsize=st.floats(min_value=1e-6, max_value=0.2),
        mdecay=st.floats(min_value=0.01, max_value=0.5),
        burn_in=st.integers(min_value=0, max_value=50),
        scale_grad=st.floats(min_value=1.0, max_value=1e4),
    )
    def test_sghmc_finite(stepsize, mdecay, burn_in, scale_grad):
        _finite_chain(
            SGHMCSampler(
                COST, stepsize_schedule=stepsize, burn_in_steps=burn_in,
                mdecay=mdecay, scale_grad=scale_grad,
            )
        )

    @settings(max_examples=10, deadline=None)
    @given(
        stepsize=st.floats(min_value=1e-6, max_value=0.1),
        A=st.floats(min_value=0.1, max_value=10.0),
        burn_in=st.integers(min_value=0, max_value=50),
    )
    def test_sgld_finite(stepsize, A, burn_in):
        _finite_chain(
            SGLDSampler(
                COST, stepsize_schedule=stepsize, burn_in_steps=burn_in, A=A
            )
        )

    @settings(max_examples=8, deadline=None)
    @given(
        stepsize=st.floats(min_value=1e-5, max_value=0.05),
        mass=st.floats(min_value=0.3, max_value=3.0),
        c=st.floats(min_value=0.5, max_value=3.0),
    )
    def test_rsghmc_finite(stepsize, mass, c):
        _finite_chain(
            RelativisticSGHMCSampler(
                COST, stepsize_schedule=stepsize, mass=mass, speed_of_light=c
            )
        )

    @settings(max_examples=8, deadline=None)
    @given(
        stepsize=st.floats(min_value=1e-6, max_value=0.05),
        alpha=st.floats(min_value=0.5, max_value=0.999),
    )
    def test_psgld_finite(stepsize, alpha):
        _finite_chain(
            PSGLDSampler(COST, stepsize_schedule=stepsize, alpha=alpha)
        )
else:  # pragma: no cover

    def test_hypothesis_missing():
        pytest.skip("hypothesis not installed")
