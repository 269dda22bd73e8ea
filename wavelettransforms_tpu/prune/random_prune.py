"""Random pruning baseline.

Zeroes, per layer, the same *count* of weights the DWT pass pruned, at
uniformly random positions (/root/reference/ResNet/random_pruning.py:42-56 —
torch.randperm becomes jax.random.permutation).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..ops import threshold as th
from .api import LayerPruneStats, PruneStats, resolve_param_key


@functools.partial(jax.jit, static_argnames=("prune_count",))
def random_prune_tensor(key, w, prune_count: int):
    mask = th.random_mask(key, w, prune_count)
    return jnp.where(mask, jnp.zeros((), w.dtype), w)


def random_pruning(params: dict, selective_stats: PruneStats,
                   seed: int = 0):
    """Apply random pruning at the DWT-matched per-layer counts."""
    counts = selective_stats.per_layer_counts()
    key = jax.random.PRNGKey(seed)
    stats = PruneStats(
        phase="random", wavelet=selective_stats.wavelet,
        level=selective_stats.level, threshold=selective_stats.threshold,
    )
    new_params = dict(params)
    for name, count in counts.items():
        pkey = resolve_param_key(params, name)
        w = jnp.asarray(params[pkey])
        key, sub = jax.random.split(key)
        pruned = random_prune_tensor(sub, w, int(count))
        total = int(w.size)
        nz = total - int(th.exact_zero_count(pruned))
        new_params[pkey] = pruned
        stats.layers.append(LayerPruneStats(
            layer_name=name, original_param_count=total,
            non_zero_params=nz, pruned_count=total - nz,
        ))
    return new_params, stats
