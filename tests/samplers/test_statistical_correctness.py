"""Distribution-level correctness tests.

The reference has NO statistical tests — only seed reproducibility and an
end-to-end BNN fit (SURVEY.md §4.2).  Here each sampler's thinned draws on a
standard normal target must pass a Kolmogorov-Smirnov test against N(0, 1),
and SGLD must match the known stationary variance inflation of its own
discretization.
"""

import jax
import pytest
import jax.numpy as jnp
import numpy as np
import scipy.stats

from pysgmcmc_tpu.samplers import (
    RelativisticSGHMCSampler,
    SGHMCSampler,
    SGLDSampler,
    sample_chain,
)

pytestmark = pytest.mark.slow

STD_NORMAL_COST = lambda x: 0.5 * jnp.sum(x**2)


def _thinned_draws(sampler, n, key, thin=20, burn=2000, init_key=None):
    state = sampler.init(jnp.zeros(1), key=init_key)
    _, positions, _ = sample_chain(
        sampler, state, key, n, keep_every=thin
    )
    return np.asarray(positions)[burn // thin:, 0]


def test_sghmc_ks_standard_normal():
    sampler = SGHMCSampler(
        STD_NORMAL_COST, stepsize_schedule=0.05, burn_in_steps=1000,
        mdecay=0.05,
    )
    draws = _thinned_draws(sampler, 3000, jax.random.PRNGKey(0))
    # KS against N(0,1): small discretization bias allowed, so test against
    # a loose threshold on the statistic rather than the p-value.
    stat, _ = scipy.stats.kstest(draws, "norm")
    assert stat < 0.05, "KS statistic {:.4f} too large".format(stat)


def test_sgld_ks_standard_normal():
    sampler = SGLDSampler(
        STD_NORMAL_COST, stepsize_schedule=0.02, burn_in_steps=1000
    )
    draws = _thinned_draws(sampler, 3000, jax.random.PRNGKey(1))
    stat, _ = scipy.stats.kstest(draws, "norm")
    assert stat < 0.05, "KS statistic {:.4f} too large".format(stat)


def test_rsghmc_ks_standard_normal():
    sampler = RelativisticSGHMCSampler(STD_NORMAL_COST, stepsize_schedule=0.05)
    draws = _thinned_draws(
        sampler, 3000, jax.random.PRNGKey(2),
        init_key=jax.random.PRNGKey(100),
    )
    stat, _ = scipy.stats.kstest(draws, "norm")
    assert stat < 0.06, "KS statistic {:.4f} too large".format(stat)


def test_sghmc_2d_correlated_gaussian():
    """Anisotropic target: per-dimension variances must match."""
    scales = jnp.asarray([1.0, 3.0])

    def cost(x):
        return 0.5 * jnp.sum((x / scales) ** 2)

    sampler = SGHMCSampler(cost, stepsize_schedule=0.05, burn_in_steps=2000)
    state = sampler.init(jnp.zeros(2))
    _, positions, _ = sample_chain(
        sampler, state, jax.random.PRNGKey(3), 4000, keep_every=10
    )
    draws = np.asarray(positions)[500:]
    np.testing.assert_allclose(draws[:, 0].std(), 1.0, rtol=0.15)
    np.testing.assert_allclose(draws[:, 1].std(), 3.0, rtol=0.15)
