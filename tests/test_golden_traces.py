"""Golden-trace regression tests.

The reference pins its prior computations bit-exactly against stored
``.npy`` files (``tests/bayesian_neural_network/test_priors.py:14-81``).
The same strategy applied to whole sampler trajectories: fixed keys, 8
steps on the banana density, compared bit-exactly against
``tests/data/golden_traces.npz``.  Any unintended change to the update
math, the burn-in EMA ordering, or the PRNG threading breaks these.

(CPU-only guarantee: XLA may legally produce different floats on other
backends; the suite always runs on CPU via conftest.)
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pysgmcmc_tpu.diagnostics.objective_functions import (
    banana_log_likelihood,
    to_negative_log_likelihood,
)
from pysgmcmc_tpu.samplers import (
    RelativisticSGHMCSampler,
    SGHMCSampler,
    SGLDSampler,
    sample_chain,
)

GOLDEN = os.path.join(os.path.dirname(__file__), "data", "golden_traces.npz")

COST = to_negative_log_likelihood(banana_log_likelihood)

SAMPLERS = {
    "sghmc": lambda: SGHMCSampler(COST, stepsize_schedule=0.01, burn_in_steps=3),
    "sgld": lambda: SGLDSampler(COST, stepsize_schedule=0.01, burn_in_steps=3),
    "rsghmc": lambda: RelativisticSGHMCSampler(COST, stepsize_schedule=0.001),
}


@pytest.mark.parametrize("name", sorted(SAMPLERS))
def test_golden_trace(name):
    data = np.load(GOLDEN)
    sampler = SAMPLERS[name]()
    state = sampler.init(jnp.asarray([0.5, -0.5]), key=jax.random.PRNGKey(7))
    _, positions, costs = sample_chain(
        sampler, state, jax.random.PRNGKey(11), 8
    )
    np.testing.assert_array_equal(
        np.asarray(positions), data[name + "_positions"]
    )
    np.testing.assert_array_equal(np.asarray(costs), data[name + "_costs"])
