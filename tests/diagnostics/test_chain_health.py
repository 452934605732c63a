import jax.numpy as jnp
import numpy as np

from pysgmcmc_tpu.diagnostics.chain_health import check_chains, divergence_step


def test_healthy_chains():
    rng = np.random.default_rng(0)
    positions = jnp.asarray(rng.normal(size=(4, 200, 2)).astype(np.float32))
    health = check_chains(positions)
    assert bool(health.ok)
    np.testing.assert_array_equal(np.asarray(health.diverged), [False] * 4)
    np.testing.assert_allclose(np.asarray(health.finite_fraction), 1.0)


def test_diverged_chain_detected():
    rng = np.random.default_rng(1)
    positions = np.asarray(rng.normal(size=(3, 100, 2)), dtype=np.float32)
    positions[1, 50:, 0] = np.nan
    health = check_chains(jnp.asarray(positions))
    assert not bool(health.ok)
    np.testing.assert_array_equal(
        np.asarray(health.diverged), [False, True, False]
    )
    assert 0.4 < float(health.finite_fraction[1]) < 0.6


def test_stuck_chain_detected():
    rng = np.random.default_rng(2)
    positions = np.asarray(rng.normal(size=(2, 300, 1)), dtype=np.float32)
    positions[0, 150:, :] = 1.234  # frozen
    health = check_chains(jnp.asarray(positions), stuck_window=100)
    assert not bool(health.ok)
    np.testing.assert_array_equal(np.asarray(health.stuck), [True, False])


def test_divergence_step():
    costs = np.zeros((2, 10), dtype=np.float32)
    costs[0, 7] = np.inf
    steps = np.asarray(divergence_step(jnp.asarray(costs)))
    np.testing.assert_array_equal(steps, [7, 10])
