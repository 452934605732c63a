"""Device mesh helpers for chain-parallel SG-MCMC.

The reference has no distributed support at all — its "multi-chain" runner
executes chains sequentially in fresh TF graphs
(``/root/reference/pysgmcmc/diagnostics/sample_chains.py:369-382``).  Chain
parallelism over a TPU mesh is therefore a new first-class component here:
chains are embarrassingly parallel, so the natural layout is a 1-D mesh with
the chain axis sharded across devices; pooled diagnostics (between-chain
variance in Gelman-Rubin, pooled ESS) become XLA collectives over ICI that
GSPMD inserts automatically from the array shardings.

Examples
--------
>>> mesh = chain_mesh(2)
>>> mesh.devices.shape
(2,)
>>> chain_sharding(mesh).spec
PartitionSpec('chains',)
"""

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec

CHAIN_AXIS = "chains"


def chain_mesh(n_devices=None, axis_name=CHAIN_AXIS):
    """A 1-D mesh over the first ``n_devices`` devices for the chain axis."""
    devices = jax.devices()
    n = len(devices) if n_devices is None else n_devices
    if n > len(devices):
        raise ValueError(
            "chain_mesh: requested {} devices but only {} available".format(
                n, len(devices)
            )
        )
    return jax.make_mesh((n,), (axis_name,), devices=devices[:n])


def chain_sharding(mesh, axis_name=CHAIN_AXIS):
    """NamedSharding that splits the leading (chain) axis across the mesh."""
    return NamedSharding(mesh, PartitionSpec(axis_name))


def shard_chains(tree, mesh, axis_name=CHAIN_AXIS):
    """Place every leaf of ``tree`` with its leading axis sharded over ``mesh``."""
    sharding = chain_sharding(mesh, axis_name)
    return jax.tree_util.tree_map(lambda leaf: jax.device_put(leaf, sharding), tree)
