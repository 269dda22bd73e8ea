"""Exact distributed percentile over sharded arrays.

The reference thresholds ONE global percentile over a whole coefficient array
(/root/reference/ResNet/dwt_pruning.py:25-32).  For mesh-sharded tensors the
same semantics need a distributed order statistic that is *deterministic and
mesh-shape invariant*.  We use radix selection on the IEEE-754 bit patterns:
for non-negative floats, value order == unsigned integer order of the bits, so
the k-th smallest |x| is found by a 32-step binary descent where each step is
one local count + one ``psum`` — exact to the ulp, no data movement beyond a
scalar per step.

np.percentile 'linear' interpolation (rank = q/100 * (n-1) = k + frac) is then
v_k + frac * (v_{k+1} - v_k), with both order statistics selected in the same
descent.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax


def _bits_of_abs(x):
    """uint32 bit pattern of |x| as float32 (order-preserving for >= 0)."""
    xa = jnp.abs(x.astype(jnp.float32))
    return lax.bitcast_convert_type(xa, jnp.uint32).ravel()


# Bits resolved per descent step in the pure-XLA path.  Measured on v5e: XLA
# does NOT fuse multi-candidate broadcast counts into one data pass (each
# candidate becomes its own reduction), so wider radix only helps in the
# Pallas count kernel (ops/pallas/select.py) where all candidates share one
# HBM read.  Keep 1 for XLA; the TPU path below uses PALLAS_RADIX_BITS.
RADIX_BITS = 1
# Measured on v5e (16.7M elements, median of 3): d=1 3.5ms, d=2 2.1ms,
# d=3 1.96ms, d=4 3.0ms — 11 passes of 7 fused candidate counts wins.
PALLAS_RADIX_BITS = 3


def _kth_smallest_bits(bits, ks, axis_name=None, radix_bits: int | None = None):
    """Radix-select the k-th smallest (0-indexed) uint32 for each k in ks:
    a most-significant-first digit descent where each step counts values
    below all 2^radix_bits candidate prefixes in ONE pass over the data —
    pure comparisons and reductions, which the TPU executes at memory
    bandwidth (scatter-based histograms are far slower on TPU).

    ``bits``: local shard (flattened).  With ``axis_name``, counts are
    all-reduced so ks index into the *global* sorted order.
    """
    d = RADIX_BITS if radix_bits is None else radix_bits
    idx_dtype = jnp.int64 if jax.config.jax_enable_x64 else jnp.int32
    ks = jnp.asarray(ks, dtype=idx_dtype)

    def step(pos: int, width: int, t):
        # t: (K,) resolved high-bit prefixes; try all non-zero digits m at
        # bit position pos.  count(bits < t|m<<pos) is monotone in m, so the
        # winning digit is the largest candidate with count <= k.
        ms = jnp.arange(1, 1 << width, dtype=jnp.uint32)
        cand = t[:, None] | (ms[None, :] << jnp.uint32(pos))  # (K, M)
        cnt = jnp.sum(
            (bits[None, None, :] < cand[:, :, None]).astype(idx_dtype),
            axis=2)
        if axis_name is not None:
            cnt = lax.psum(cnt, axis_name)
        keep = cnt <= ks[:, None]
        return jnp.max(jnp.where(keep, cand, t[:, None]), axis=1)

    t = jnp.zeros(ks.shape, jnp.uint32)
    pos = 32
    while pos > 0:  # static unroll: ceil(32/d) fused count passes
        width = min(d, pos)
        pos -= width
        t = step(pos, width, t)
    return t


def _kth_smallest_bits_pallas(bits_leaves, ks, interpret: bool = False,
                              radix_bits: int | None = None):
    """Same descent as ``_kth_smallest_bits`` but counting with the Pallas
    multi-candidate kernel: all 2^d-1 candidates per step share one HBM read
    (ops/pallas/select.py), so the descent costs ceil(32/d) passes instead of
    32.  Single-chip only (no axis_name)."""
    from ..ops.pallas.select import count_below

    d = PALLAS_RADIX_BITS if radix_bits is None else radix_bits
    ks = jnp.asarray(ks, dtype=jnp.int32)
    kk = ks.shape[0]
    t = jnp.zeros((kk,), jnp.uint32)
    pos = 32
    while pos > 0:
        width = min(d, pos)
        pos -= width
        ms = jnp.arange(1, 1 << width, dtype=jnp.uint32)
        cand = t[:, None] | (ms[None, :] << jnp.uint32(pos))  # (K, M)
        cnt = count_below(bits_leaves, cand.ravel(), interpret)
        keep = cnt.reshape(cand.shape) <= ks[:, None]
        t = jnp.max(jnp.where(keep, cand, t[:, None]), axis=1)
    return t


def _use_pallas_select(leaves, axis_name) -> bool:
    if axis_name is not None:
        return False
    n = sum(l.size for l in leaves)
    if not (1 << 18) <= n < (1 << 31):
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _bits_to_float(t):
    return lax.bitcast_convert_type(t, jnp.float32)


def percentile_abs(x, percentile, axis_name=None, total_size: int | None = None):
    """Exact np.percentile(|x|, percentile, method='linear') for a (possibly
    sharded) array.  ``percentile`` must be a static float; with ``axis_name``
    set, x is the local shard inside shard_map and total_size the GLOBAL
    element count (static)."""
    n = total_size if total_size is not None else x.size
    rank = _numpy_rank(percentile, n, x.dtype)
    k = int(rank)
    frac = rank - k
    ks = (k, min(k + 1, n - 1))
    if _use_pallas_select([x], axis_name):
        t = _kth_smallest_bits_pallas([_bits_of_abs(x)], ks)
    else:
        t = _kth_smallest_bits(_bits_of_abs(x), ks, axis_name)
    return _numpy_lerp(_bits_to_float(t), frac)


def _numpy_rank(percentile, n: int, dtype) -> float:
    from ..ops.threshold import numpy_virtual_rank

    return numpy_virtual_rank(percentile, n, dtype)


def _numpy_lerp(v, frac: float):
    """numpy's _lerp between the two exact order statistics, computed in the
    data dtype with the two-sided formula (exact f32 parity)."""
    if frac == 0.0:
        return v[0]
    a, b = v[0], v[1]
    t = v.dtype.type(frac)
    diff = b - a
    if frac >= 0.5:
        return b - diff * (v.dtype.type(1) - t)
    return a + diff * t


def percentile_abs_pytree(tree, percentile, axis_name=None,
                          total_size: int | None = None):
    """Global percentile of |values| across every leaf of a pytree (the
    sharded-subband representation of a wavedec2 result)."""
    leaves = jax.tree_util.tree_leaves(tree)
    n = total_size if total_size is not None else sum(l.size for l in leaves)
    rank = _numpy_rank(percentile, n, leaves[0].dtype)
    k = int(rank)
    frac = rank - k
    ks = (k, min(k + 1, n - 1))
    if _use_pallas_select(leaves, axis_name):
        # per-leaf counting: no concatenated copy of the coefficients
        t = _kth_smallest_bits_pallas([_bits_of_abs(l) for l in leaves], ks)
    else:
        bits = jnp.concatenate([_bits_of_abs(l) for l in leaves])
        t = _kth_smallest_bits(bits, ks, axis_name)
    return _numpy_lerp(_bits_to_float(t), frac)
