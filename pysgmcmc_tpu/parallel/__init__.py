from pysgmcmc_tpu.parallel.chains import run_chains, stack_positions
from pysgmcmc_tpu.parallel.mesh import (
    CHAIN_AXIS,
    chain_mesh,
    chain_sharding,
    shard_chains,
)

__all__ = [
    "run_chains",
    "stack_positions",
    "chain_mesh",
    "chain_sharding",
    "shard_chains",
    "CHAIN_AXIS",
]
