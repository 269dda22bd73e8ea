"""Unified pruning API over parameter pytrees.

The reference implements three pruning methods as separate torch modules
mutating an nn.Module in place and coupling through a CSV log
(/root/reference/ResNet/{dwt_pruning,min_weight_pruning,random_pruning}.py).
Here the same three methods are pure functions over a dict of named arrays:

    new_params, stats = method(params, ...)

``stats`` carries the exact per-layer schema of the reference's log.csv
(GUID, Wavelet, Level, Threshold, DWT Phase, Original Parameter Count,
Non-zero Params, Total Pruned Count, Layer Name —
/root/reference/ResNet/utils.py:55-58) so budget matching and CSV output are
byte-compatible, but the coupling is in-memory instead of through a file
(``utils/logging.py`` still writes the CSVs).
"""
from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class LayerPruneStats:
    layer_name: str
    original_param_count: int
    non_zero_params: int
    pruned_count: int


@dataclass
class PruneStats:
    """Aggregated result of one pruning pass (one method over one model)."""

    phase: str  # 'selective' | 'min' | 'random'
    wavelet: str
    level: int
    threshold: float
    layers: list[LayerPruneStats] = field(default_factory=list)

    @property
    def total_params(self) -> int:
        return sum(l.original_param_count for l in self.layers)

    @property
    def total_pruned(self) -> int:
        return sum(l.pruned_count for l in self.layers)

    @property
    def total_non_zero(self) -> int:
        return sum(l.non_zero_params for l in self.layers)

    @property
    def prune_fraction(self) -> float:
        """Achieved global prune fraction — the budget that min-weight pruning
        replays (/root/reference/ResNet/min_weight_pruning.py:54-63)."""
        tp = self.total_params
        return self.total_pruned / tp if tp else 0.0

    def per_layer_counts(self) -> dict[str, int]:
        """layer -> pruned count — the budget random pruning replays
        (/root/reference/ResNet/random_pruning.py:42-47)."""
        return {l.layer_name: l.pruned_count for l in self.layers}


def resolve_param_key(params: dict, layer_name: str) -> str:
    """Accept either tensor keys ('...convolution.weight') or module names
    ('...convolution' — the reference's log.csv convention) when replaying a
    budget onto a param dict."""
    if layer_name in params:
        return layer_name
    alt = layer_name + ".weight"
    if alt in params:
        return alt
    raise KeyError(layer_name)


def is_conv_kernel(name: str, arr) -> bool:
    """Default layer filter: 4-D conv kernels, the reference's nn.Conv2d-only
    scope (/root/reference/ResNet/dwt_pruning.py:155-156)."""
    return getattr(arr, "ndim", 0) == 4
