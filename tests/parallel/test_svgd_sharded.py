import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pysgmcmc_tpu.parallel.mesh import chain_mesh
from pysgmcmc_tpu.parallel.svgd import run_svgd_sharded
from pysgmcmc_tpu.samplers.svgd import SVGDSampler


def _gaussian_sampler():
    return SVGDSampler(lambda x: 0.5 * jnp.sum(x**2), stepsize_schedule=0.3)


def test_sharded_matches_single_device():
    """Sharded SVGD is numerically equivalent to the vmapped single-device
    step (same bandwidth, same kernel, same Adagrad trajectory)."""
    sampler = _gaussian_sampler()
    particles = jax.random.normal(jax.random.PRNGKey(0), (32, 3)) * 2.0

    # single-device trajectory
    state = sampler.init(particles)
    key = jax.random.PRNGKey(1)
    step = jax.jit(sampler.step)
    scan_key = key
    for i in range(20):
        scan_key, sub = jax.random.split(scan_key)
        state, _ = step(state, sub)
    expected = np.asarray(state.position)

    # sharded trajectory (keys are unused by SVGD's deterministic transport,
    # but the scan splits them the same way)
    mesh = chain_mesh(8)
    state_sharded = sampler.init(particles)
    state_sharded, costs = run_svgd_sharded(
        sampler, state_sharded, key, 20, mesh
    )
    got = np.asarray(state_sharded.position)
    np.testing.assert_allclose(got, expected, rtol=2e-5, atol=2e-6)
    assert costs.shape == (32,)


def test_sharded_svgd_converges():
    sampler = _gaussian_sampler()
    particles = jax.random.normal(jax.random.PRNGKey(2), (64, 2)) * 4.0 + 3.0
    mesh = chain_mesh(8)
    state = sampler.init(particles)
    state, _ = run_svgd_sharded(sampler, state, jax.random.PRNGKey(3), 400, mesh)
    final = np.asarray(state.position)
    assert abs(final.mean()) < 0.3
    assert abs(final.std() - 1.0) < 0.3


def test_sharded_svgd_divisibility():
    sampler = _gaussian_sampler()
    particles = jnp.zeros((10, 2))
    mesh = chain_mesh(8)
    state = sampler.init(particles)
    with pytest.raises(ValueError):
        run_svgd_sharded(sampler, state, jax.random.PRNGKey(0), 2, mesh)
