from .masks import (
    get_mask_from_lengths,
    get_float_mask_from_lengths,
    get_mask_3d,
    masked_mean,
)
from .misc import set_random_seed, count_parameters, prob2bool

__all__ = [
    "get_mask_from_lengths",
    "get_float_mask_from_lengths",
    "get_mask_3d",
    "masked_mean",
    "set_random_seed",
    "count_parameters",
    "prob2bool",
]
