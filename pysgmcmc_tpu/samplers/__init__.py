from pysgmcmc_tpu.samplers.base import (
    IterativeSampler,
    MCMCSampler,
    SamplerInfo,
    sample_chain,
)
from pysgmcmc_tpu.samplers.relativistic_sghmc import (
    RelativisticSGHMCSampler,
    RelativisticSGHMCState,
)
from pysgmcmc_tpu.samplers.psgld import PSGLDSampler, PSGLDState
from pysgmcmc_tpu.samplers.sghmc import SGHMCSampler, SGHMCState
from pysgmcmc_tpu.samplers.sgld import SGLDSampler, SGLDState
from pysgmcmc_tpu.samplers.sgnht import SGNHTSampler, SGNHTState
from pysgmcmc_tpu.samplers.svgd import SVGDSampler, SVGDState

__all__ = [
    "MCMCSampler",
    "SamplerInfo",
    "IterativeSampler",
    "sample_chain",
    "SGHMCSampler",
    "SGHMCState",
    "SGLDSampler",
    "SGLDState",
    "RelativisticSGHMCSampler",
    "RelativisticSGHMCState",
    "SVGDSampler",
    "SVGDState",
    "PSGLDSampler",
    "PSGLDState",
    "SGNHTSampler",
    "SGNHTState",
]
