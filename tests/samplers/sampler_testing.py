"""Shared sampler test harness.

Mirrors the reference's seed-determinism harness
(``/root/reference/pysgmcmc/tests/samplers/sampler_testing.py:29-59``): build
the same sampler twice from the same PRNG key and assert the two chains agree
sample-by-sample and cost-by-cost.  With explicit threefry keys this becomes
*exact* equality rather than the reference's ``allclose``.
"""

import jax
import jax.numpy as jnp
import numpy as np

from pysgmcmc_tpu.diagnostics.objective_functions import (
    banana_log_likelihood,
    gmm1_log_likelihood,
    to_negative_log_likelihood,
)
from pysgmcmc_tpu.samplers.base import sample_chain


def random_objective(rng):
    """Pick a random (objective, initial params) pair like the reference harness."""
    if rng.integers(2) == 0:
        cost_fn = to_negative_log_likelihood(gmm1_log_likelihood)
        params = jnp.asarray([1.0])
    else:
        cost_fn = to_negative_log_likelihood(banana_log_likelihood)
        params = jnp.asarray([1.0, 1.0])
    return cost_fn, params


def seed_test(make_sampler, n_draws=None, rng_seed=None):
    """Two identically-keyed chains must be bitwise identical."""
    rng = np.random.default_rng(rng_seed)
    cost_fn, params = random_objective(rng)
    if n_draws is None:
        n_draws = int(rng.integers(10, 80))
    seed = int(rng.integers(0, 2**31 - 1))

    chains, cost_chains = [], []
    for _ in range(2):
        sampler = make_sampler(cost_fn)
        key = jax.random.PRNGKey(seed)
        state = sampler.init(params)
        _, positions, costs = sample_chain(sampler, state, key, n_draws)
        chains.append(np.asarray(positions))
        cost_chains.append(np.asarray(costs))

    np.testing.assert_array_equal(chains[0], chains[1])
    np.testing.assert_array_equal(cost_chains[0], cost_chains[1])
    assert chains[0].shape == (n_draws, params.shape[0])
    assert np.all(np.isfinite(chains[0]))
    assert np.all(np.isfinite(cost_chains[0]))
