"""Model introspection utilities — equivalents of the reference's helpers
(/root/reference/ResNet/utils.py:165-238: print_model_summary,
print_model_structure, get_layer) over flat HF state dicts and flax trees.
"""
from __future__ import annotations

import numpy as np


def model_summary(state: dict, sink=print) -> int:
    """Tabulate weight tensors and parameter counts; returns the total."""
    total = 0
    sink("Model Summary:")
    sink(f"{'Tensor':70s} {'Shape':>20s} {'Params':>12s}")
    sink("=" * 104)
    for name, arr in state.items():
        a = np.asarray(arr)
        total += a.size
        sink(f"{name:70s} {str(tuple(a.shape)):>20s} {a.size:>12d}")
    sink("=" * 104)
    sink(f"Total Params: {total}")
    return total


def model_structure(state: dict, sink=print, max_depth: int = 99):
    """Print the module hierarchy implied by dotted tensor names."""
    seen = set()
    for name in state:
        parts = name.split(".")
        for depth in range(min(len(parts) - 1, max_depth)):
            prefix = ".".join(parts[: depth + 1])
            if prefix not in seen:
                seen.add(prefix)
                sink("  " * depth + parts[depth])


def get_layer_tensors(state: dict, layer_name: str) -> dict:
    """All tensors under a dotted module path (reference get_layer analog,
    tolerant of a model-class-name prefix)."""
    for prefix in ("ResNetForImageClassification.", ""):
        if layer_name.startswith(prefix) and prefix:
            layer_name = layer_name[len(prefix):]
    hits = {k: v for k, v in state.items()
            if k == layer_name or k.startswith(layer_name + ".")}
    return hits
