from pysgmcmc_tpu.diagnostics import model_diagnostics, objective_functions
from pysgmcmc_tpu.diagnostics.arviz_export import to_arviz, to_inference_dict
from pysgmcmc_tpu.diagnostics.chain_health import check_chains, divergence_step
from pysgmcmc_tpu.diagnostics.sample_chains import (
    MultiTrace,
    PYSGMCMCTrace,
    pysgmcmc_multitrace,
)
from pysgmcmc_tpu.diagnostics.sampler_diagnostics import (
    effective_sample_size,
    effective_sample_size_bulk,
    effective_sample_sizes,
    gelman_rubin,
    gelman_rubin_from_sampler,
    gelman_rubin_split,
)

__all__ = [
    "objective_functions",
    "model_diagnostics",
    "check_chains",
    "divergence_step",
    "PYSGMCMCTrace",
    "MultiTrace",
    "pysgmcmc_multitrace",
    "effective_sample_size",
    "effective_sample_size_bulk",
    "effective_sample_sizes",
    "gelman_rubin",
    "gelman_rubin_from_sampler",
    "gelman_rubin_split",
    "to_arviz",
    "to_inference_dict",
]
