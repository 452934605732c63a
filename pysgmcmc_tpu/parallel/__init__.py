from pysgmcmc_tpu.parallel.chains import (
    make_chain_runner,
    run_chains,
    stack_positions,
)
from pysgmcmc_tpu.parallel.mesh import (
    CHAIN_AXIS,
    HOST_AXIS,
    chain_mesh,
    chain_sharding,
    initialize_multihost,
    mesh_chain_axes,
    multihost_mesh,
    shard_chains,
)
from pysgmcmc_tpu.parallel.svgd import run_svgd_sharded

__all__ = [
    "run_chains",
    "make_chain_runner",
    "stack_positions",
    "run_svgd_sharded",
    "chain_mesh",
    "chain_sharding",
    "shard_chains",
    "mesh_chain_axes",
    "multihost_mesh",
    "initialize_multihost",
    "CHAIN_AXIS",
    "HOST_AXIS",
]
