from .api import LayerPruneStats, PruneStats, is_conv_kernel
from .dwt_prune import clamped_level, dwt_prune_tensor, wavelet_pruning
from .min_weight import min_weight_pruning, min_weight_prune_tensor
from .random_prune import random_pruning, random_prune_tensor

__all__ = [
    "LayerPruneStats", "PruneStats", "is_conv_kernel",
    "clamped_level", "dwt_prune_tensor", "wavelet_pruning",
    "min_weight_pruning", "min_weight_prune_tensor",
    "random_pruning", "random_prune_tensor",
]
