"""SGNHT (Nosé-Hoover thermostat) sampler tests.

Beyond-reference sampler (Ding et al., NeurIPS 2014); same test model as
the rest of the family: exact-seed determinism (the reference's harness,
``/root/reference/pysgmcmc/tests/samplers/sampler_testing.py:29-59``),
statistical correctness on a known target, and thermostat-specific
behavior (kinetic-temperature control replaces a hand-tuned friction).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pysgmcmc_tpu.samplers.base import sample_chain
from pysgmcmc_tpu.samplers.sgnht import SGNHTSampler
from pysgmcmc_tpu.sampling import Sampler

from .sampler_testing import seed_test


def test_seed_reproducibility():
    seed_test(
        lambda cost_fn: SGNHTSampler(cost_fn, stepsize_schedule=0.01),
        rng_seed=7,
    )


def test_through_factory():
    sampler = Sampler.get_sampler(
        Sampler.SGNHT, cost_fn=lambda x: 0.5 * jnp.sum(x**2), a_diff=2.0
    )
    assert type(sampler).__name__ == "SGNHTSampler"
    assert sampler.a_diff == 2.0
    assert Sampler.is_supported(Sampler.SGNHT)
    assert not Sampler.is_burn_in_mcmc(Sampler.SGNHT)


def test_invalid_a_diff_raises():
    with pytest.raises(ValueError):
        SGNHTSampler(lambda x: jnp.sum(x), a_diff=0.0)


def test_momentum_init_from_key():
    """With a key, momentum starts N(0, I); without, zeros (and xi = A)."""
    sampler = SGNHTSampler(lambda x: 0.5 * jnp.sum(x**2), a_diff=1.5)
    state = sampler.init(jnp.zeros(64), jax.random.PRNGKey(0))
    p = np.asarray(state.momentum)
    assert p.std() > 0.5  # a draw, not zeros
    assert float(state.xi) == 1.5
    state0 = sampler.init(jnp.zeros(64))
    np.testing.assert_array_equal(np.asarray(state0.momentum), 0.0)


def test_samples_target_gaussian():
    """SGNHT on a standard 2-D normal: mean/var close to (0, 1)."""
    cost_fn = lambda x: 0.5 * jnp.sum(x**2)
    sampler = SGNHTSampler(cost_fn, stepsize_schedule=0.05)
    state = sampler.init(jnp.zeros(2), jax.random.PRNGKey(0))
    state, positions, _ = sample_chain(
        sampler, state, jax.random.PRNGKey(1), 20000
    )
    draws = np.asarray(positions)[5000:]
    assert np.abs(draws.mean(axis=0)).max() < 0.15
    np.testing.assert_allclose(draws.var(axis=0), 1.0, atol=0.2)


def test_thermostat_absorbs_gradient_noise():
    """The thermostat's defining property (Ding et al. §3): under noisy
    gradients, xi self-adjusts ABOVE the diffusion constant A to absorb
    the extra injected energy, keeping the kinetic temperature at 1 —
    where plain SGHMC would need its friction retuned by hand."""
    key_noise = jax.random.PRNGKey(42)

    def noisy_cost(x, batch):
        # batch carries a fresh noise key; gradient noise std 1.0
        eta = jax.random.normal(batch, x.shape)
        return 0.5 * jnp.sum(x**2) + jnp.sum(eta * x)

    sampler = SGNHTSampler(noisy_cost, stepsize_schedule=0.05, a_diff=1.0)
    state = sampler.init(jnp.zeros(8), jax.random.PRNGKey(2))
    state, positions, _ = sample_chain(
        sampler, state, jax.random.PRNGKey(3), 20000,
        batch_fn=lambda key: key,
    )
    # xi rose above A to compensate the gradient-noise heating ...
    assert float(state.xi) > 1.05
    # ... and the sampled variance still matches the target
    draws = np.asarray(positions)[5000:]
    np.testing.assert_allclose(draws.var(axis=0).mean(), 1.0, atol=0.25)


@pytest.mark.slow
def test_sgnht_ks_standard_normal():
    cost_fn = lambda x: 0.5 * jnp.sum(x**2)
    sampler = SGNHTSampler(cost_fn, stepsize_schedule=0.05)
    state = sampler.init(jnp.zeros(1), jax.random.PRNGKey(4))
    _, positions, _ = sample_chain(
        sampler, state, jax.random.PRNGKey(5), 3000, keep_every=20
    )
    import scipy.stats

    draws = np.asarray(positions)[100:, 0]
    stat, _ = scipy.stats.kstest(draws, "norm")
    assert stat < 0.05, "KS statistic {:.4f} too large".format(stat)
