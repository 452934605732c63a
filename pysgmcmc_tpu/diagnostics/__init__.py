from pysgmcmc_tpu.diagnostics import objective_functions

__all__ = ["objective_functions"]
