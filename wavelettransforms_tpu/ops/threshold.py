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
            t = _kth_smallest_bits(_bits_of_abs(x).ravel(), ks)
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


def _abs_order_bits(x):
    """Shape-preserving uint32 bit pattern of |x| as float32 — order- AND
    tie-preserving for float32/bfloat16/float16 inputs (the cast to f32 is
    exact for the half types)."""
    from jax import lax

    return lax.bitcast_convert_type(
        jnp.abs(x.astype(jnp.float32)), jnp.uint32)


def _flat_iota_u32(shape):
    """Flat (C-order over trailing dims) element index + 1, built from
    per-dim broadcasted iotas — natural layout, no reshape/relayout of the
    operand (a flat view of an (O, I, 3, 3) tensor costs ~4.5 GB/s retiling
    on TPU).  +1 keeps 0 free as a 'nothing selected' sentinel."""
    from jax import lax

    idx = jnp.ones(shape, jnp.uint32)
    stride = 1
    for d in reversed(range(1, len(shape))):
        idx = idx + lax.broadcasted_iota(jnp.uint32, shape, d) * jnp.uint32(
            stride)
        stride *= shape[d]
    return idx


def smallest_bits_mask_sliced(bits, counts):
    """Exact-count selection mask over a (G, ...) uint32 key stack: per
    slice g, mark the ``counts[g]`` smallest keys, ties at the boundary
    broken by ascending flat index (== stable-argsort order).

    TPU-native count-threshold selection, everything in the operand's
    NATURAL layout: one per-slice radix descent finds the boundary key
    (bandwidth-bound fused count passes, no sort), a strict-below compare
    selects the bulk, and a SECOND descent over synthetic index keys picks
    the first (count - below) boundary ties in flat order — no scatter, no
    cumsum scan, no flat relayout."""
    from ..parallel.quantile import kth_smallest_bits_sliced

    g = bits.shape[0]
    counts = jnp.asarray(counts, jnp.int32).reshape(g)
    t = kth_smallest_bits_sliced(bits, counts - 1)  # boundary key per slice
    tb = t.reshape((g,) + (1,) * (bits.ndim - 1))
    below = bits < tb
    eq = bits == tb
    mid = tuple(range(1, bits.ndim))
    cnt_below = jnp.sum(below, axis=mid).astype(jnp.int32)
    # ties: the boundary key itself always occurs >= 1 time; take the first
    # need = count - below of its occurrences in flat order by radix-selecting
    # the need-th smallest flat index among them (indices are 1-based so
    # need == 0 resolves to the 0 sentinel and selects nothing)
    need = counts - cnt_below
    idx1 = _flat_iota_u32(bits.shape)
    tie_keys = jnp.where(eq, idx1, jnp.uint32(0xFFFFFFFF))
    t_idx = kth_smallest_bits_sliced(tie_keys, need - 1)
    tix = t_idx.reshape((g,) + (1,) * (bits.ndim - 1))
    return below | (eq & (idx1 <= tix))


def _sort_smallest_mask(x, prune_count: int):
    """Stable-argsort selection — fallback for dtypes whose ordering a
    float32 bit pattern cannot represent (float64 under x64)."""
    flat = jnp.abs(x).ravel()
    order = jnp.argsort(flat)  # ascending, stable
    mask = jnp.zeros(flat.shape, dtype=bool).at[order[:prune_count]].set(True)
    return mask.reshape(x.shape)


def topk_smallest_mask(x, prune_count: int):
    """Boolean mask selecting the ``prune_count`` smallest-|x| entries of the
    flattened array (min-weight pruning semantics,
    /root/reference/ResNet/min_weight_pruning.py:66-74).  prune_count is
    static.  Ties at the count boundary resolve in ascending flat-index
    order (stable argsort semantics), but the selection itself is a radix
    count-threshold descent — no O(n log n) sort, no scatter."""
    if x.dtype == jnp.float64:
        return _sort_smallest_mask(x, prune_count)
    bits = _abs_order_bits(x)
    return smallest_bits_mask_sliced(
        bits.reshape((1,) + bits.shape), (prune_count,))[0].reshape(x.shape)


def random_mask(key, x, prune_count: int):
    """Boolean mask selecting ``prune_count`` uniformly-random entries
    (random pruning semantics, /root/reference/ResNet/random_pruning.py:53-55
    — the reference's torch.randperm(N)[:count]).

    TPU-native form: draw one uint32 key per element and select the
    ``prune_count`` smallest — an exactly-uniform random subset (order
    statistics of iid keys), with boundary collisions resolved to the exact
    count by the shared count-threshold machinery.  Avoids materializing and
    sorting a full permutation."""
    n = x.size
    rbits = jax.random.bits(key, (1, n), jnp.uint32)
    return smallest_bits_mask_sliced(rbits, (prune_count,))[0].reshape(x.shape)
