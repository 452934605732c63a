from pysgmcmc_tpu.utils.checkpoint import restore_checkpoint, save_checkpoint
from pysgmcmc_tpu.utils.numeric import median, safe_divide, safe_sqrt
from pysgmcmc_tpu.utils.profiling import StepTimer, trace
from pysgmcmc_tpu.utils.pytree import (
    normal_like_tree,
    tree_cast,
    tree_ones_like,
    tree_size,
    tree_zeros_like,
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
    "save_checkpoint",
    "restore_checkpoint",
    "StepTimer",
    "trace",
]
