from pysgmcmc_tpu.ops.pairwise import (
    median_bandwidth,
    pdist,
    squared_distance_matrix,
    squareform,
    svgd_kernel,
)
from pysgmcmc_tpu.ops.svgd_streaming import svgd_phi_streaming
from pysgmcmc_tpu.ops.relativistic import (
    relativistic_kinetic_energy,
    sample_relativistic_momentum,
    sample_relativistic_momentum_tree,
)

__all__ = [
    "pdist",
    "squareform",
    "squared_distance_matrix",
    "median_bandwidth",
    "svgd_kernel",
    "svgd_phi_streaming",
    "sample_relativistic_momentum",
    "sample_relativistic_momentum_tree",
    "relativistic_kinetic_energy",
]
