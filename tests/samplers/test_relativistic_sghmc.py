import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pysgmcmc_tpu.ops.relativistic import (
    relativistic_kinetic_energy,
    sample_relativistic_momentum,
)
from pysgmcmc_tpu.samplers.base import sample_chain
from pysgmcmc_tpu.samplers.relativistic_sghmc import RelativisticSGHMCSampler

from .sampler_testing import seed_test


def test_seed_reproducibility():
    seed_test(
        lambda cost_fn: RelativisticSGHMCSampler(cost_fn, stepsize_schedule=0.001),
        rng_seed=3,
    )


def test_momentum_marginal_moments():
    """Rejection sampler matches the symmetric hyperbolic distribution.

    For m=c=1 the marginal is p(p) ∝ exp(-sqrt(p^2+1)); its variance,
    computed by numeric quadrature, is ≈ 2.841; the mean is 0 by symmetry.
    """
    draws = sample_relativistic_momentum(
        jax.random.PRNGKey(0), (200_000,), m=1.0, c=1.0
    )
    draws = np.asarray(draws)

    grid = np.linspace(-60, 60, 400001)
    pdf = np.exp(-np.sqrt(grid**2 + 1))
    pdf /= np.trapezoid(pdf, grid)
    true_var = np.trapezoid(grid**2 * pdf, grid)

    assert abs(draws.mean()) < 0.02
    assert abs(draws.var() - true_var) / true_var < 0.03


def test_momentum_marginal_large_mass():
    """Envelope rejection stays exact for heavier m*c^2 (slower, still correct)."""
    m, c = 2.0, 1.5
    draws = np.asarray(
        sample_relativistic_momentum(jax.random.PRNGKey(1), (100_000,), m=m, c=c)
    )
    grid = np.linspace(-80, 80, 400001)
    pdf = np.exp(-m * c**2 * np.sqrt(grid**2 / (m**2 * c**2) + 1))
    pdf /= np.trapezoid(pdf, grid)
    true_var = np.trapezoid(grid**2 * pdf, grid)
    assert abs(draws.mean()) < 0.02
    assert abs(draws.var() - true_var) / true_var < 0.05


def test_momentum_marginal_heavy_mass():
    """The tilted envelope keeps acceptance O(1) even for large m*c^2
    (a naive Laplace envelope would accept ~e^-12 of proposals here)."""
    m, c = 3.0, 2.0
    draws = np.asarray(
        sample_relativistic_momentum(jax.random.PRNGKey(5), (100_000,), m=m, c=c)
    )
    grid = np.linspace(-60, 60, 400001)
    pdf = np.exp(-m * c**2 * np.sqrt(grid**2 / (m**2 * c**2) + 1))
    pdf /= np.trapezoid(pdf, grid)
    true_var = np.trapezoid(grid**2 * pdf, grid)
    assert abs(draws.mean()) < 0.02
    assert abs(draws.var() - true_var) / true_var < 0.05


def test_kinetic_energy():
    np.testing.assert_allclose(
        float(relativistic_kinetic_energy(jnp.asarray(0.0))), 1.0
    )


def test_samples_target_gaussian():
    """RSGHMC on a standard normal: mean/std close to (0, 1)."""
    cost_fn = lambda x: 0.5 * jnp.sum(x**2)
    sampler = RelativisticSGHMCSampler(cost_fn, stepsize_schedule=0.05)
    state = sampler.init(jnp.zeros(1), key=jax.random.PRNGKey(100))
    _, positions, _ = sample_chain(sampler, state, jax.random.PRNGKey(4), 40000)
    draws = np.asarray(positions)[10000:, 0]
    assert abs(draws.mean()) < 0.15
    assert abs(draws.std() - 1.0) < 0.25


@pytest.mark.slow
def test_pytree_params():
    """Unlike the reference (scalar-only momenta), pytree params work."""
    params = {"a": jnp.zeros((2, 3)), "b": jnp.zeros(4)}
    cost_fn = lambda p: 0.5 * (jnp.sum(p["a"] ** 2) + jnp.sum(p["b"] ** 2))
    sampler = RelativisticSGHMCSampler(cost_fn)
    state = sampler.init(params, key=jax.random.PRNGKey(0))
    state, info = jax.jit(sampler.step)(state, jax.random.PRNGKey(1))
    assert state.position["a"].shape == (2, 3)
    assert np.isfinite(float(info.cost))
