from pysgmcmc_tpu.utils.numeric import safe_divide, safe_sqrt, median
from pysgmcmc_tpu.utils.pytree import (
    tree_size,
    tree_zeros_like,
    tree_ones_like,
    tree_cast,
    normal_like_tree,
)

__all__ = [
    "safe_divide",
    "safe_sqrt",
    "median",
    "tree_size",
    "tree_zeros_like",
    "tree_ones_like",
    "tree_cast",
    "normal_like_tree",
]
