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


@functools.partial(jax.jit, static_argnames=("counts",))
def _gang_random(key, tensors: tuple, counts: tuple):
    """Whole-checkpoint random sweep as ONE jitted program: one uint32 key
    per element, per-layer count-threshold selection of the ``counts[i]``
    smallest keys (an exactly-uniform random subset — the order statistics
    of iid keys replace the reference's randperm), with same-size layers
    sharing one batched radix descent.  Returns (pruned, zero_counts)."""
    n = len(tensors)
    subkeys = jax.random.split(key, n)
    out: list = [None] * n
    zeros: list = [None] * n
    groups: dict = {}
    for i, t in enumerate(tensors):
        groups.setdefault(t.shape, []).append(i)
    for shape, idxs in groups.items():
        # keys are drawn directly in the weights' NATURAL shape — a flat
        # (G, N) mask would need a reshape back to (O, I, kh, kw), and that
        # relayout runs at ~4.5 GB/s (measured: it put the whole sweep at
        # 25 ms; natural-layout masks bring it to ~1 ms)
        rbits = jnp.stack([jax.random.bits(subkeys[i], shape, jnp.uint32)
                           for i in idxs])
        mask = th.smallest_bits_mask_sliced(
            rbits, tuple(counts[i] for i in idxs))
        for j, i in enumerate(idxs):
            w = tensors[i]
            out[i] = jnp.where(mask[j], jnp.zeros((), w.dtype), w)
            zeros[i] = th.exact_zero_count(out[i])
    return tuple(out), tuple(zeros)


def random_pruning(params: dict, selective_stats: PruneStats,
                   seed: int = 0):
    """Apply random pruning at the DWT-matched per-layer counts, gang-traced
    so a 20-layer checkpoint is one compile per (shapes, counts) instead of
    one per layer."""
    counts = selective_stats.per_layer_counts()
    stats = PruneStats(
        phase="random", wavelet=selective_stats.wavelet,
        level=selective_stats.level, threshold=selective_stats.threshold,
    )
    names = list(counts.keys())
    pkeys = [resolve_param_key(params, n) for n in names]
    tensors = tuple(jnp.asarray(params[k]) for k in pkeys)
    pruned, zeros = _gang_random(jax.random.PRNGKey(seed), tensors,
                                 tuple(int(counts[n]) for n in names))
    new_params = dict(params)
    for name, pkey, w, p, z in zip(names, pkeys, tensors, pruned, zeros):
        total = int(w.size)
        nz = total - int(z)
        new_params[pkey] = p
        stats.layers.append(LayerPruneStats(
            layer_name=name, original_param_count=total,
            non_zero_params=nz, pruned_count=total - nz,
        ))
    return new_params, stats
