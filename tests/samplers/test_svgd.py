import jax
import pytest
import jax.numpy as jnp
import numpy as np
import scipy.spatial.distance

from pysgmcmc_tpu.ops.pairwise import pdist, squared_distance_matrix, squareform
from pysgmcmc_tpu.samplers.svgd import SVGDSampler


@pytest.mark.slow
def test_pdist_matches_scipy():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(12, 5)).astype(np.float32)
    ours = np.asarray(pdist(jnp.asarray(x)))
    theirs = scipy.spatial.distance.pdist(x).astype(np.float32)
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_squareform_roundtrip():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(9, 3)).astype(np.float32)
    condensed = pdist(jnp.asarray(x))
    square = np.asarray(squareform(condensed))
    theirs = scipy.spatial.distance.squareform(
        scipy.spatial.distance.pdist(x)
    ).astype(np.float32)
    np.testing.assert_allclose(square, theirs, rtol=1e-4, atol=1e-5)


def test_squared_distance_matrix_nonnegative():
    x = jnp.ones((6, 4))
    d2 = squared_distance_matrix(x)
    assert float(d2.min()) >= 0.0


@pytest.mark.slow
def test_svgd_gaussian_moments():
    """Particles approximate a 2D standard normal after convergence."""
    cost_fn = lambda x: 0.5 * jnp.sum(x**2)  # NLL of N(0, I)
    sampler = SVGDSampler(cost_fn, stepsize_schedule=0.3)
    key = jax.random.PRNGKey(0)
    particles = jax.random.normal(key, (200, 2)) * 3.0 + 2.0  # bad init
    state = sampler.init(particles)

    step = jax.jit(sampler.step)
    for i in range(600):
        state, info = step(state, jax.random.PRNGKey(i))

    final = np.asarray(state.position)
    assert abs(final.mean()) < 0.12
    assert abs(final.std() - 1.0) < 0.15


def test_svgd_particles_repel():
    """Identical-ish particles spread out (the reference's sign bug would
    collapse them instead)."""
    cost_fn = lambda x: 0.5 * jnp.sum(x**2)
    sampler = SVGDSampler(cost_fn, stepsize_schedule=0.1)
    particles = jnp.asarray(
        [[0.1, 0.0], [0.0, 0.1], [-0.1, 0.0], [0.0, -0.1], [0.05, 0.05]]
    )
    state = sampler.init(particles)
    d2_before = float(squared_distance_matrix(state.position).mean())
    step = jax.jit(sampler.step)
    for i in range(100):
        state, _ = step(state, jax.random.PRNGKey(i))
    d2_after = float(squared_distance_matrix(state.position).mean())
    assert d2_after > d2_before


def test_svgd_pytree_particles():
    """Ensembles over structured parameters (the reference's XXX wart, fixed)."""
    particles = {
        "w": jnp.zeros((8, 3, 2)),
        "b": jnp.linspace(-1, 1, 8).reshape(8, 1),
    }
    cost_fn = lambda p: 0.5 * (jnp.sum(p["w"] ** 2) + jnp.sum(p["b"] ** 2))
    sampler = SVGDSampler(cost_fn)
    state = sampler.init(particles)
    state, info = jax.jit(sampler.step)(state, jax.random.PRNGKey(0))
    assert state.position["w"].shape == (8, 3, 2)
    assert info.cost.shape == (8,)


def test_svgd_list_of_particles():
    """Reference-style list-of-particles input is stacked automatically."""
    particle_list = [jnp.asarray([0.0, 1.0]), jnp.asarray([1.0, 0.0])]
    cost_fn = lambda x: 0.5 * jnp.sum(x**2)
    sampler = SVGDSampler(cost_fn)
    state = sampler.init(particle_list)
    assert state.position.shape == (2, 2)
