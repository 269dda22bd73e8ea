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


def numpy_virtual_rank(percentile: float, n: int, dtype) -> float:
    """numpy's virtual percentile rank, **bug-for-bug**: numpy casts the
    quantile q/100 (computed in f64) to the array dtype and multiplies by
    (n-1) in that dtype — for float32 arrays with millions of elements the
    fractional rank quantizes away (ulp(2.4e6) ~ 0.25).  The reference
    thresholds float32 coeff arrays through exactly this path
    (/root/reference/ResNet/dwt_pruning.py:27), so we reproduce it."""
    import numpy as np

    if np.dtype(dtype) == np.float32:
        rank = float(np.float32(float(percentile) / 100.0) * np.float32(n - 1))
    else:
        rank = (float(percentile) / 100.0) * (n - 1)
    return min(max(rank, 0.0), float(n - 1))


def percentile_threshold_value(x, percentile: float):
    """np.percentile(|x|, percentile, method='linear') over the whole array.

    ``percentile`` must be a static python float (rank resolution happens
    host-side for exact numpy parity; lerp for fractional ranks is computed in
    the array dtype, within 1 ulp of numpy's mixed-precision lerp).

    Large float32 arrays use exact byte-radix selection (4 bincount passes,
    bandwidth-bound) instead of a full sort."""
    n = x.size
    rank = numpy_virtual_rank(float(percentile), n, x.dtype)
    k = int(rank)
    frac = rank - k
    if x.dtype == jnp.float32 and n >= (1 << 18):
        from ..parallel.quantile import (_bits_of_abs, _bits_to_float,
                                         _kth_smallest_bits,
                                         _kth_smallest_bits_natural,
                                         _kth_smallest_bits_pallas,
                                         _use_natural, _use_pallas_select)

        ks = (k, min(k + 1, n - 1))
        if _use_pallas_select([x], None):
            t = _kth_smallest_bits_pallas([_bits_of_abs(x)], ks)
        elif _use_natural([x], None):
            t = _kth_smallest_bits_natural([x], ks)
        else:
            t = _kth_smallest_bits(_bits_of_abs(x), ks)
        v = _bits_to_float(t)
        a, b = v[0], v[1]
        if frac == 0.0:
            return a
    else:
        flat = jnp.abs(x).ravel()
        s = jnp.sort(flat)
        a = s[k]
        if frac == 0.0:
            return a
        b = s[min(k + 1, n - 1)]
    diff = b - a
    t = x.dtype.type(frac)
    # numpy's _lerp: compute from the nearer side for symmetry
    if frac >= 0.5:
        return b - diff * (x.dtype.type(1) - t)
    return a + diff * t


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
