from pysgmcmc_tpu.parallel.chains import (
    make_chain_runner,
    run_chains,
    stack_positions,
)
from pysgmcmc_tpu.parallel.mesh import (
    CHAIN_AXIS,
    chain_mesh,
    chain_sharding,
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
    "CHAIN_AXIS",
]
