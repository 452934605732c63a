import jax
import jax.numpy as jnp
import numpy as np

from pysgmcmc_tpu.diagnostics.sampler_diagnostics import gelman_rubin
from pysgmcmc_tpu.parallel.chains import run_chains, stack_positions
from pysgmcmc_tpu.parallel.mesh import chain_mesh
from pysgmcmc_tpu.samplers.sghmc import SGHMCSampler
from pysgmcmc_tpu.samplers.sgld import SGLDSampler


def _gaussian_sampler(cls=SGHMCSampler):
    return cls(lambda x: 0.5 * jnp.sum(x**2), stepsize_schedule=0.05,
               burn_in_steps=50)


def test_run_chains_unsharded():
    sampler = _gaussian_sampler()
    positions = stack_positions(jnp.zeros(3), 5)
    chains, costs = run_chains(sampler, positions, jax.random.PRNGKey(0), 30)
    assert chains.shape == (5, 30, 3)
    assert costs.shape == (5, 30)
    # distinct chains
    assert np.std(np.asarray(chains)[:, -1, 0]) > 0


def test_run_chains_sharded_mesh():
    """Chain axis sharded over the 8 virtual CPU devices."""
    assert len(jax.devices()) == 8, "conftest should force 8 CPU devices"
    mesh = chain_mesh(8)
    sampler = _gaussian_sampler(SGLDSampler)
    positions = stack_positions(
        jnp.zeros(2), 16, jitter=0.1, key=jax.random.PRNGKey(1)
    )
    chains, costs = run_chains(
        sampler, positions, jax.random.PRNGKey(2), 50, mesh=mesh
    )
    assert chains.shape == (16, 50, 2)
    # output really is sharded over the mesh
    shard_devices = {s.device for s in chains.addressable_shards}
    assert len(shard_devices) == 8


def test_sharded_matches_unsharded():
    """Sharding must not change the numerics: same keys -> same chains."""
    mesh = chain_mesh(4)
    sampler = _gaussian_sampler()
    positions = stack_positions(jnp.zeros(2), 8)
    key = jax.random.PRNGKey(3)
    chains_plain, _ = run_chains(sampler, positions, key, 20)
    chains_mesh, _ = run_chains(sampler, positions, key, 20, mesh=mesh)
    np.testing.assert_allclose(
        np.asarray(chains_plain), np.asarray(chains_mesh), rtol=1e-6
    )


def test_pooled_diagnostics_on_sharded_chains():
    """Gelman-Rubin over mesh-sharded histories (GSPMD inserts collectives)."""
    mesh = chain_mesh(8)
    sampler = _gaussian_sampler()
    positions = stack_positions(
        jnp.zeros(1), 8, jitter=1.0, key=jax.random.PRNGKey(4)
    )
    chains, _ = run_chains(
        sampler, positions, jax.random.PRNGKey(5), 500, mesh=mesh
    )
    r_hat = jax.jit(gelman_rubin)(chains)
    assert np.asarray(r_hat).shape == (1,)
    assert float(np.asarray(r_hat)[0]) < 2.0


def test_runner_cache_no_collision_between_same_config_samplers():
    """Two distinct sampler objects must not share a cached runner."""
    from pysgmcmc_tpu.parallel.chains import make_chain_runner

    a = _gaussian_sampler()
    b = _gaussian_sampler()
    runner_a = make_chain_runner(a, n_samples=3)
    runner_b = make_chain_runner(b, n_samples=3)
    assert runner_a is not runner_b
    # same object -> cache hit
    assert make_chain_runner(a, n_samples=3) is runner_a


def test_runner_cache_gc_does_not_recycle_slot():
    """A GC'd sampler's cache slot must not serve a new sampler that happens
    to land at the same memory address (the classic ``id()`` reuse hazard)."""
    import gc

    from pysgmcmc_tpu.parallel.chains import _RUNNER_CACHE, make_chain_runner

    stale = _gaussian_sampler()
    runner_stale = make_chain_runner(stale, n_samples=3)
    stale_id = id(stale)
    del stale
    gc.collect()
    # the weakref callback must have evicted the dead entry
    import weakref

    assert not any(
        isinstance(k[0], weakref.ref) and k[0]() is None
        for k in list(_RUNNER_CACHE)
    )
    # allocate until we (very likely) reuse the freed address; even when the
    # address differs the assertion below must hold for a correct cache
    fresh = None
    for _ in range(64):
        candidate = SGHMCSampler(
            lambda x: jnp.sum(jnp.abs(x)), stepsize_schedule=0.9, burn_in_steps=0
        )
        if id(candidate) == stale_id:
            fresh = candidate
            break
        fresh = candidate
    runner_fresh = make_chain_runner(fresh, n_samples=3)
    assert runner_fresh is not runner_stale


def test_stack_positions_jitter():
    stacked = stack_positions(
        {"w": jnp.zeros((2, 2))}, 4, jitter=0.5, key=jax.random.PRNGKey(0)
    )
    assert stacked["w"].shape == (4, 2, 2)
    flat = np.asarray(stacked["w"]).reshape(4, -1)
    assert np.std(flat[:, 0]) > 0
