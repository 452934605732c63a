from pysgmcmc_tpu.samplers.base import (
    IterativeSampler,
    MCMCSampler,
    SamplerInfo,
    sample_chain,
)
from pysgmcmc_tpu.samplers.sghmc import SGHMCSampler, SGHMCState
from pysgmcmc_tpu.samplers.sgld import SGLDSampler, SGLDState

__all__ = [
    "MCMCSampler",
    "SamplerInfo",
    "IterativeSampler",
    "sample_chain",
    "SGHMCSampler",
    "SGHMCState",
    "SGLDSampler",
    "SGLDState",
]
