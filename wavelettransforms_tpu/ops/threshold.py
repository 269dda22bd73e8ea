"""Thresholding and sparsity accounting (jittable).

Replicates the reference's coefficient-thresholding semantics:
  * percentile threshold over |packed mosaic| with numpy 'linear'
    interpolation (/root/reference/ResNet/dwt_pruning.py:25-32: one global
    np.percentile per layer, strict `< threshold -> 0` comparison);
  * legacy absolute threshold (/root/reference/ResNet/dwt_pruning_NoEntropy.py:45);
  * exact-zero prune counts (/root/reference/ResNet/dwt_pruning.py:88-89) and
    the 1e-6 near-zero census used by the eval suite
    (/root/reference/ResNet/testing_suite/eval_model.py:7-20).

For sharded arrays, ``distributed_percentile`` in ``parallel/quantile.py``
computes the same global quantile via an all-reduced histogram refinement.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

NEAR_ZERO = 1e-6


def percentile_threshold_value(x, percentile):
    """np.percentile(|x|, percentile) with 'linear' interpolation, over the
    *whole* array (all axes).  ``percentile`` in [0, 100]."""
    return jnp.percentile(jnp.abs(x).ravel(), percentile, method="linear")


def hard_threshold(x, threshold):
    """Zero entries with |x| strictly below ``threshold`` (reference semantics:
    values equal to the threshold survive)."""
    return jnp.where(jnp.abs(x) < threshold, jnp.zeros((), x.dtype), x)


def percentile_threshold(x, percentile):
    """Fused global-percentile + hard threshold.  Returns (pruned, thr)."""
    thr = percentile_threshold_value(x, percentile)
    return hard_threshold(x, thr), thr


def exact_zero_count(x):
    return jnp.sum(x == 0)


def near_zero_count(x, eps: float = NEAR_ZERO):
    return jnp.sum(jnp.abs(x) < eps)


def sparsity(x, eps: float = 0.0):
    """Fraction of (near-)zero entries; eps=0 -> exact zeros."""
    if eps == 0.0:
        z = exact_zero_count(x)
    else:
        z = near_zero_count(x, eps)
    return z / x.size


def topk_smallest_mask(x, prune_count: int):
    """Boolean mask selecting the ``prune_count`` smallest-|x| entries of the
    flattened array (min-weight pruning semantics,
    /root/reference/ResNet/min_weight_pruning.py:66-74).  prune_count is
    static."""
    flat = jnp.abs(x).ravel()
    order = jnp.argsort(flat)  # ascending, stable
    mask = jnp.zeros(flat.shape, dtype=bool).at[order[:prune_count]].set(True)
    return mask.reshape(x.shape)


def random_mask(key, x, prune_count: int):
    """Boolean mask selecting ``prune_count`` uniformly-random entries
    (random pruning semantics, /root/reference/ResNet/random_pruning.py:53-55)."""
    n = x.size
    perm = jax.random.permutation(key, n)
    mask = jnp.zeros((n,), dtype=bool).at[perm[:prune_count]].set(True)
    return mask.reshape(x.shape)
