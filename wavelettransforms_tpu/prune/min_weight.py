"""Minimum-weight pruning baseline.

Replays the *global* prune fraction achieved by the DWT pass uniformly per
layer: prune_count = int(layer_size * global_fraction) smallest-|w| entries
(/root/reference/ResNet/min_weight_pruning.py:54-74).  The budget arrives as a
``PruneStats`` from the selective pass (in-memory equivalent of the
reference's log.csv coupling) or as an explicit fraction.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..ops import threshold as th
from .api import LayerPruneStats, PruneStats, resolve_param_key


@functools.partial(jax.jit, static_argnames=("prune_count",))
def min_weight_prune_tensor(w, prune_count: int):
    """Zero the ``prune_count`` smallest-|w| entries (static count)."""
    mask = th.topk_smallest_mask(w, prune_count)
    return jnp.where(mask, jnp.zeros((), w.dtype), w)


def min_weight_pruning(params: dict, selective_stats: PruneStats | None = None,
                       prune_fraction: float | None = None,
                       layer_names=None):
    """Apply min-weight pruning at the DWT-matched budget.

    Layer selection and per-layer original counts come from the selective
    stats (reference reads them back from log.csv,
    /root/reference/ResNet/min_weight_pruning.py:92-103).
    """
    if prune_fraction is None:
        if selective_stats is None:
            raise ValueError("need selective_stats or prune_fraction")
        prune_fraction = selective_stats.prune_fraction
    if layer_names is None:
        if selective_stats is None:
            raise ValueError("need selective_stats or layer_names")
        layer_names = [l.layer_name for l in selective_stats.layers]

    stats = PruneStats(
        phase="min",
        wavelet=selective_stats.wavelet if selective_stats else "",
        level=selective_stats.level if selective_stats else 0,
        threshold=selective_stats.threshold if selective_stats else prune_fraction,
    )
    new_params = dict(params)
    for name in layer_names:
        key = resolve_param_key(params, name)
        w = jnp.asarray(params[key])
        total = int(w.size)
        count = int(total * prune_fraction)
        pruned = min_weight_prune_tensor(w, count)
        nz = total - int(th.exact_zero_count(pruned))
        new_params[key] = pruned
        stats.layers.append(LayerPruneStats(
            layer_name=name, original_param_count=total,
            non_zero_params=nz, pruned_count=total - nz,
        ))
    return new_params, stats
