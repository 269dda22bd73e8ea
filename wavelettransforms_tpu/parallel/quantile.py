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


def _kth_smallest_bits(bits, ks, axis_name=None):
    """Radix-select the k-th smallest (0-indexed) uint32 for each k in ks:
    32 bit-bisection steps, each one masked count + (optionally) a psum —
    pure comparisons and reductions, which the TPU executes at memory
    bandwidth (scatter-based histograms are far slower on TPU).

    ``bits``: local shard (flattened).  With ``axis_name``, counts are
    all-reduced so ks index into the *global* sorted order.
    """
    idx_dtype = jnp.int64 if jax.config.jax_enable_x64 else jnp.int32
    ks = jnp.asarray(ks, dtype=idx_dtype)

    def step(b, t):
        # t: (len(ks),) candidate prefixes
        t_try = t | (jnp.uint32(1) << jnp.uint32(b))
        # count of values strictly below each candidate
        cnt = jnp.sum(
            (bits[None, :] < t_try[:, None]).astype(idx_dtype), axis=1)
        if axis_name is not None:
            cnt = lax.psum(cnt, axis_name)
        keep = cnt <= ks
        return jnp.where(keep, t_try, t)

    t0 = jnp.zeros(ks.shape, jnp.uint32)
    t = lax.fori_loop(
        0, 32, lambda i, t: step(jnp.uint32(31) - jnp.uint32(i), t), t0)
    return t


def _bits_to_float(t):
    return lax.bitcast_convert_type(t, jnp.float32)


def percentile_abs(x, percentile, axis_name=None, total_size: int | None = None):
    """Exact np.percentile(|x|, percentile, method='linear') for a (possibly
    sharded) array.  ``percentile`` must be a static float; with ``axis_name``
    set, x is the local shard inside shard_map and total_size the GLOBAL
    element count (static)."""
    bits = _bits_of_abs(x)
    n = total_size if total_size is not None else x.size
    rank = _numpy_rank(percentile, n, x.dtype)
    k = int(rank)
    frac = rank - k
    ks = (k, min(k + 1, n - 1))
    t = _kth_smallest_bits(bits, ks, axis_name)
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
    bits = jnp.concatenate([_bits_of_abs(l) for l in leaves])
    n = total_size if total_size is not None else sum(l.size for l in leaves)
    rank = _numpy_rank(percentile, n, leaves[0].dtype)
    k = int(rank)
    frac = rank - k
    t = _kth_smallest_bits(bits, (k, min(k + 1, n - 1)), axis_name)
    return _numpy_lerp(_bits_to_float(t), frac)
