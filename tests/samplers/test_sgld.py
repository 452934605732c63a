import jax
import jax.numpy as jnp
import numpy as np

from pysgmcmc_tpu.samplers.base import sample_chain
from pysgmcmc_tpu.samplers.sgld import SGLDSampler

from .sampler_testing import seed_test


def test_seed_reproducibility():
    seed_test(
        lambda cost_fn: SGLDSampler(cost_fn, stepsize_schedule=0.01, burn_in_steps=20),
        rng_seed=2,
    )


def test_samples_target_gaussian():
    """SGLD on a standard normal: mean/std close to (0, 1)."""
    cost_fn = lambda x: 0.5 * jnp.sum(x**2)
    sampler = SGLDSampler(cost_fn, stepsize_schedule=0.05, burn_in_steps=500)
    state = sampler.init(jnp.zeros(1))
    state, positions, _ = sample_chain(
        sampler, state, jax.random.PRNGKey(11), 30000
    )
    draws = np.asarray(positions)[10000:, 0]
    assert abs(draws.mean()) < 0.15
    assert abs(draws.std() - 1.0) < 0.25


def test_burn_in_zero_steps():
    """burn_in_steps=0 keeps minv at its init value of ones."""
    cost_fn = lambda x: 0.5 * jnp.sum(x**2)
    sampler = SGLDSampler(cost_fn, burn_in_steps=0)
    state = sampler.init(jnp.asarray([1.0]))
    for i in range(3):
        state, _ = sampler.step(state, jax.random.PRNGKey(i))
    np.testing.assert_array_equal(
        np.asarray(state.stats.minv), np.ones_like(np.asarray(state.stats.minv))
    )


def test_psgld_samples_target_gaussian():
    """pSGLD (beyond-reference) on a standard normal."""
    from pysgmcmc_tpu.samplers.psgld import PSGLDSampler

    cost_fn = lambda x: 0.5 * jnp.sum(x**2)
    sampler = PSGLDSampler(cost_fn, stepsize_schedule=0.01)
    state = sampler.init(jnp.zeros(1))
    _, positions, _ = sample_chain(sampler, state, jax.random.PRNGKey(5), 30000)
    draws = np.asarray(positions)[10000:, 0]
    assert abs(draws.mean()) < 0.2
    assert abs(draws.std() - 1.0) < 0.25


def test_psgld_through_factory():
    from pysgmcmc_tpu.sampling import Sampler

    sampler = Sampler.get_sampler(
        Sampler.PSGLD, cost_fn=lambda x: 0.5 * jnp.sum(x**2)
    )
    assert type(sampler).__name__ == "PSGLDSampler"
    assert Sampler.is_supported(Sampler.PSGLD)
    assert not Sampler.is_burn_in_mcmc(Sampler.PSGLD)
