"""Multi-host (2-axis hosts x chips) mesh support.

Runs on the virtual 8-device CPU mesh: ``multihost_mesh(n_hosts=2)``
emulates a 2-host x 4-chip topology.  Chains shard over *both* axes and
must be bitwise identical to the unsharded vmap.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pysgmcmc_tpu.parallel.chains import run_chains, stack_positions
from pysgmcmc_tpu.parallel.mesh import (
    CHAIN_AXIS,
    HOST_AXIS,
    chain_mesh,
    initialize_multihost,
    mesh_chain_axes,
    multihost_mesh,
)
from pysgmcmc_tpu.samplers.sghmc import SGHMCSampler


def _sampler():
    return SGHMCSampler(
        lambda x: 0.5 * jnp.sum(x**2), stepsize_schedule=0.05,
        burn_in_steps=10,
    )


def test_multihost_mesh_shape():
    mesh = multihost_mesh(n_hosts=2)
    n = len(jax.devices())
    assert mesh.devices.shape == (2, n // 2)
    assert mesh.axis_names == (HOST_AXIS, CHAIN_AXIS)


def test_multihost_mesh_uneven_raises():
    with pytest.raises(ValueError, match="split evenly"):
        multihost_mesh(n_hosts=3)


def test_mesh_chain_axes_expansion():
    mesh2d = multihost_mesh(n_hosts=2)
    assert mesh_chain_axes(mesh2d) == (HOST_AXIS, CHAIN_AXIS)
    # explicit non-default names are untouched
    assert mesh_chain_axes(mesh2d, ("a", "b")) == ("a", "b")
    mesh1d = chain_mesh(2)
    assert mesh_chain_axes(mesh1d) == CHAIN_AXIS
    assert mesh_chain_axes(None) == CHAIN_AXIS


def test_chains_on_2d_mesh_match_unsharded():
    """Sharding chains over a hosts x chips mesh is bitwise neutral."""
    mesh = multihost_mesh(n_hosts=2)
    n_chains = 2 * mesh.devices.size
    sampler = _sampler()
    positions = stack_positions(
        jnp.ones(3), n_chains, jitter=0.1, key=jax.random.PRNGKey(0)
    )
    key = jax.random.PRNGKey(1)

    ref_chains, ref_costs = run_chains(sampler, positions, key, 5)
    got_chains, got_costs = run_chains(
        sampler, positions, key, 5, mesh=mesh
    )
    np.testing.assert_array_equal(np.asarray(ref_chains), np.asarray(got_chains))
    np.testing.assert_array_equal(np.asarray(ref_costs), np.asarray(got_costs))

    # outputs really spread over every device of the 2-D mesh
    n_dev = len({s.device for s in got_costs.addressable_shards})
    assert n_dev == mesh.devices.size


def test_initialize_multihost_single_process_noop():
    """In a single-process context initialization must be a harmless no-op."""
    initialize_multihost()
    initialize_multihost()  # idempotent
    assert jax.process_count() == 1
