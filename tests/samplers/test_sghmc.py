import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pysgmcmc_tpu.diagnostics.objective_functions import (
    banana_log_likelihood,
    to_negative_log_likelihood,
)
from pysgmcmc_tpu.samplers.base import IterativeSampler, sample_chain
from pysgmcmc_tpu.samplers.sghmc import SGHMCSampler

from .sampler_testing import seed_test


def test_seed_reproducibility():
    seed_test(
        lambda cost_fn: SGHMCSampler(cost_fn, stepsize_schedule=0.01, burn_in_steps=20),
        rng_seed=1,
    )


def test_burn_in_freezes_minv():
    """minv adapts during burn-in and is frozen afterwards.

    Mirrors the reference's feed-back-frozen-minv behavior
    (``base_classes.py:432-454``).
    """
    cost_fn = to_negative_log_likelihood(banana_log_likelihood)
    sampler = SGHMCSampler(cost_fn, burn_in_steps=5)
    state = sampler.init(jnp.asarray([0.5, -0.3]))
    key = jax.random.PRNGKey(0)

    minvs = []
    for i in range(10):
        key, sub = jax.random.split(key)
        state, _ = sampler.step(state, sub)
        minvs.append(np.asarray(state.stats.minv))

    # During burn-in, minv changes from its init value of ones.
    assert not np.allclose(minvs[1], np.ones_like(minvs[1]))
    # After burn-in (steps 5..9) minv must be constant.
    for later in minvs[6:]:
        np.testing.assert_array_equal(minvs[5], later)
    # And it must differ from before the freeze took full effect.
    assert not np.array_equal(minvs[0], minvs[5])


def test_momentum_and_position_update_shapes_pytree():
    """Samplers operate on arbitrary pytrees (no vectorize/unvectorize dance)."""
    params = {"w": jnp.ones((3, 2)), "b": jnp.zeros((2,))}

    def cost_fn(p):
        return jnp.sum(p["w"] ** 2) + jnp.sum(p["b"] ** 2)

    sampler = SGHMCSampler(cost_fn, burn_in_steps=2)
    state = sampler.init(params)
    state, info = jax.jit(sampler.step)(state, jax.random.PRNGKey(0))
    assert state.position["w"].shape == (3, 2)
    assert state.position["b"].shape == (2,)
    assert jnp.ndim(info.cost) == 0


def test_sample_chain_thinning():
    cost_fn = to_negative_log_likelihood(banana_log_likelihood)
    sampler = SGHMCSampler(cost_fn, burn_in_steps=0)
    state = sampler.init(jnp.asarray([0.0, 0.0]))

    # keep_every=1 for 20 steps and keep_every=4 for 5x4 steps must agree
    # on the thinned subsequence.
    _, dense, _ = sample_chain(sampler, state, jax.random.PRNGKey(7), 20)
    _, thinned, _ = sample_chain(
        sampler, state, jax.random.PRNGKey(7), 5, keep_every=4
    )
    np.testing.assert_array_equal(np.asarray(dense)[3::4], np.asarray(thinned))


def test_iterator_facade():
    """Reference-style `sample, cost = next(sampler)` protocol."""
    banana_nll = to_negative_log_likelihood(banana_log_likelihood)
    cost_fn = lambda params: banana_nll(params[0])  # params is a 1-element list
    sampler = SGHMCSampler(cost_fn, burn_in_steps=3)
    it = IterativeSampler(sampler, params=[jnp.asarray([1.0, 2.0])], key=42)
    assert it.is_burning_in
    sample, cost = next(it)
    assert sample.shape == (2,)
    assert jnp.ndim(cost) == 0
    draws = it.take(5)
    assert len(draws) == 5
    assert not it.is_burning_in or it.n_iterations < 3


def test_iterator_with_host_batch_generator():
    """Reference-style host-side batch generators feed the iterator facade
    (cf. ``data_batches.py`` generators driving ``session.run`` feeds)."""
    from pysgmcmc_tpu.data_batches import generate_batches

    rng = np.random.default_rng(0)
    x = rng.normal(size=(50, 2)).astype(np.float32)
    y = rng.normal(size=(50,)).astype(np.float32)

    def cost_fn(params, batch):
        xb, yb = batch
        pred = xb @ params
        return jnp.sum((yb[:, 0] - pred) ** 2)

    sampler = SGHMCSampler(cost_fn, stepsize_schedule=1e-3, burn_in_steps=5)
    it = IterativeSampler(
        sampler,
        params=jnp.zeros(2),
        key=0,
        batch_generator=generate_batches(x, y, batch_size=10, seed=3),
    )
    for _ in range(5):
        sample, cost = next(it)
        assert sample.shape == (2,)
        assert np.isfinite(float(cost))


def test_invalid_inputs():
    with pytest.raises(ValueError):
        SGHMCSampler("not a callable")
    with pytest.raises(ValueError):
        SGHMCSampler(lambda p: jnp.sum(p), burn_in_steps=-1)


def test_samples_target_gaussian():
    """Statistical sanity: SGHMC samples a standard normal reasonably well."""
    cost_fn = lambda x: 0.5 * jnp.sum(x**2)
    sampler = SGHMCSampler(cost_fn, stepsize_schedule=0.05, burn_in_steps=500)
    state = sampler.init(jnp.zeros(1))
    state, positions, _ = sample_chain(
        sampler, state, jax.random.PRNGKey(3), 20000
    )
    draws = np.asarray(positions)[5000:, 0]
    assert abs(draws.mean()) < 0.15
    assert abs(draws.std() - 1.0) < 0.25


@pytest.mark.slow
def test_iterator_with_callable_batch_fn():
    """IterativeSampler accepts pure (key) -> batch selectors too."""
    from pysgmcmc_tpu.data_batches import batch_fn as make_batch_fn

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(40, 2)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(40,)).astype(np.float32))

    def cost_fn(params, batch):
        xb, yb = batch
        return jnp.sum((yb[:, 0] - xb @ params) ** 2)

    sampler = SGHMCSampler(cost_fn, stepsize_schedule=1e-3, burn_in_steps=2)
    it = IterativeSampler(
        sampler, params=jnp.zeros(2), key=1,
        batch_generator=make_batch_fn(x, y, batch_size=8),
    )
    for _ in range(4):
        sample, cost = next(it)
        assert np.isfinite(float(cost))
