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


@functools.partial(jax.jit, static_argnames=("counts",))
def _gang_min(tensors: tuple, counts: tuple):
    """Whole-checkpoint min-weight sweep as ONE jitted program (the
    per-method analog of dwt_prune._gang_encode): same-shape layers are
    stacked and share one per-slice radix count-threshold descent, so the
    20-layer ResNet-18 pass costs ceil(32/d) fused count passes per shape
    group instead of 20 sorts + scatters.  Returns (pruned, zero_counts),
    bit-identical per layer to ``min_weight_prune_tensor``."""
    n = len(tensors)
    out: list = [None] * n
    zeros: list = [None] * n
    groups: dict = {}
    for i, t in enumerate(tensors):
        if t.dtype == jnp.float64:  # f32 bit-order unrepresentable: sort path
            out[i] = min_weight_prune_tensor(t, counts[i])
            zeros[i] = th.exact_zero_count(out[i])
        else:
            groups.setdefault((t.shape, str(t.dtype)), []).append(i)
    for idxs in groups.values():
        stacked = (jnp.stack([tensors[i] for i in idxs])
                   if len(idxs) > 1 else tensors[idxs[0]][None])
        bits = th._abs_order_bits(stacked)
        mask = th.smallest_bits_mask_sliced(
            bits, tuple(counts[i] for i in idxs))
        pruned = jnp.where(mask, jnp.zeros((), stacked.dtype), stacked)
        for j, i in enumerate(idxs):
            out[i] = pruned[j]
            zeros[i] = th.exact_zero_count(out[i])
    return tuple(out), tuple(zeros)


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
    keys = [resolve_param_key(params, name) for name in layer_names]
    tensors = tuple(jnp.asarray(params[k]) for k in keys)
    counts = tuple(int(t.size * prune_fraction) for t in tensors)
    pruned, zeros = _gang_min(tensors, counts)
    for name, key, w, p, z in zip(layer_names, keys, tensors, pruned, zeros):
        total = int(w.size)
        nz = total - int(z)
        new_params[key] = p
        stats.layers.append(LayerPruneStats(
            layer_name=name, original_param_count=total,
            non_zero_params=nz, pruned_count=total - nz,
        ))
    return new_params, stats
