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
    """uint32 bit pattern of |x| as float32 (order-preserving for >= 0).
    SHAPE-PRESERVING: the Pallas count kernel consumes wide 2-D leaves in
    their natural layout; flat consumers ravel at the use site."""
    xa = jnp.abs(x.astype(jnp.float32))
    return lax.bitcast_convert_type(xa, jnp.uint32)


# Bits resolved per descent step.  Two fast forms, both measured on v5e:
#   * NATURAL-layout XLA descent (``_kth_smallest_bits_natural``): compare
#     against candidates on a NEW TRAILING axis of the un-reshaped tensor —
#     XLA fuses all candidates into one natural-layout reduction pass.  This
#     is the right path for conv-shaped tensors: ANY materialization of a
#     flat (N/128, 128) view of an (O, I, 3, 3) tensor costs ~4.5 GB/s
#     retiling (measured 10 ms for a ResNet-18's conv stack), dwarfing the
#     counts themselves.
#   * Pallas count kernel (ops/pallas/select.py) for tensors whose natural
#     layout is already lane-aligned (big 2-D mosaics): all candidates share
#     one HBM read with double-buffered DMA (16.7M elements: d=1 3.5ms,
#     d=2 2.1ms, d=3 1.96ms, d=4 3.0ms).
# The legacy flat broadcast form (bits[None, :] < cand[:, None]) does NOT
# fuse (each candidate became its own pass) — kept only as the int64
# fallback for >= 2^31-element global counts (sharded or not) and for CPU.
RADIX_BITS = 1
NATURAL_RADIX_BITS = 3
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


def _kth_smallest_bits_natural(xs, ks, radix_bits: int | None = None,
                               axis_name=None):
    """Radix descent with counts taken in each array's NATURAL layout:
    ``xs`` is a list of arrays (any shapes — a pytree's leaves); each step
    counts |x| bits below all candidate prefixes via a trailing broadcast
    axis, which XLA fuses into ONE reduction pass per leaf with no layout
    change.  ks: (K,) global ranks across all leaves together.

    With ``axis_name`` (inside shard_map), per-shard counts are psum'd so
    ks index the GLOBAL order — the distributed descent costs ceil(32/d)
    psums of a (K*M,) vector instead of 32."""
    d = NATURAL_RADIX_BITS if radix_bits is None else radix_bits
    ks = jnp.asarray(ks, dtype=jnp.int32)
    kk = ks.shape[0]
    bits = [lax.bitcast_convert_type(jnp.abs(x.astype(jnp.float32)),
                                     jnp.uint32) for x in xs]
    t = jnp.zeros((kk,), jnp.uint32)
    pos = 32
    while pos > 0:
        width = min(d, pos)
        pos -= width
        ms = jnp.arange(1, 1 << width, dtype=jnp.uint32)
        cand = (t[:, None] | (ms[None, :] << jnp.uint32(pos)))  # (K, M)
        flat = cand.ravel()
        cnt = jnp.zeros((flat.size,), jnp.int32)
        for b in bits:
            cnt = cnt + jnp.sum(
                b[..., None] < flat, axis=tuple(range(b.ndim))
            ).astype(jnp.int32)
        if axis_name is not None:
            cnt = lax.psum(cnt, axis_name)
        keep = cnt.reshape(cand.shape) <= ks[:, None]
        t = jnp.max(jnp.where(keep, cand, t[:, None]), axis=1)
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


def percentile_abs_stacks(stacks, percentile, radix_bits: int | None = None,
                          pad_zeros=None):
    """Exact np.percentile(|stack[g]|, percentile) independently for every
    slice of a LIST of stacks (one stack per same-shape layer group), all
    advanced in ONE lockstep radix descent.

    Per step, every stack's candidate counts are computed in its natural
    layout and every group's count vector sits at the SAME program depth
    with no cross-group dependency — so under GSPMD / shard_map the
    all-reduces of a whole checkpoint's groups combine into one collective
    per step (ceil(32/d) total) instead of one per group per step (the
    round-3 sharded gang encode paid ceil(32/d) psum rounds PER GROUP:
    3.1x overhead at 8 devices).  Sequential per-group descents also
    serialize on a single chip; lockstep frees XLA to fuse across groups.

    ``pad_zeros`` (optional, static): one (G_i,)-sequence of ints per stack
    — the number of PHYSICAL zero-pad elements inside slice g (the
    pad-and-mask channel-sharding fallback appends zero out-channels so an
    awkward tensor can still shard over the mesh).  Slice g's percentile is
    then taken over its true n - pad[g] elements: pad zeros sort first in
    |.| order, so the true k-th order statistic is the padded (k + pad[g])-
    th — the rank shift keeps the result bit-identical to the unpadded
    tensor's percentile.

    Returns a list of (G_i,) float32 threshold vectors, bit-identical to
    per-stack ``percentile_abs_batched`` / per-slice ``percentile_abs``."""
    import numpy as np

    d = NATURAL_RADIX_BITS if radix_bits is None else radix_bits
    metas = []  # per stack: (g, fracs (G,) np, ks (G, 2), bits)
    for si, st in enumerate(stacks):
        g = st.shape[0]
        n = st.size // g
        pads = ([0] * g if pad_zeros is None or pad_zeros[si] is None
                else list(pad_zeros[si]))
        ks = np.zeros((g, 2), np.int32)
        fracs = np.zeros((g,), np.float64)
        for gi, pad in enumerate(pads):
            nt = n - int(pad)  # true element count of this slice
            rank = _numpy_rank(float(percentile), nt, st.dtype)
            k = int(rank)
            fracs[gi] = rank - k
            ks[gi] = (k + pad, min(k + 1, nt - 1) + pad)
        metas.append((g, fracs, jnp.asarray(ks),
                      lax.bitcast_convert_type(
                          jnp.abs(st.astype(jnp.float32)), jnp.uint32)))
    ts = [jnp.zeros((m[0], 2), jnp.uint32) for m in metas]
    pos = 32
    while pos > 0:
        width = min(d, pos)
        pos -= width
        ms = jnp.arange(1, 1 << width, dtype=jnp.uint32)
        new_ts = []
        for t, (g, _fracs, ks, bits) in zip(ts, metas):
            cand = t[:, :, None] | (ms[None, None, :] << jnp.uint32(pos))
            flat = cand.reshape(g, -1)  # (G, C)
            bflat = flat.reshape((g,) + (1,) * (bits.ndim - 1)
                                 + (flat.shape[1],))
            cnt = jnp.sum(bits[..., None] < bflat,
                          axis=tuple(range(1, bits.ndim))).astype(
                              jnp.int32)  # (G, C)
            keep = cnt.reshape(cand.shape) <= ks[:, :, None]
            new_ts.append(jnp.max(jnp.where(keep, cand, t[:, :, None]),
                                  axis=2))
        ts = new_ts
    outs = []
    for t, (_g, fracs, _ks, _bits) in zip(ts, metas):
        v = _bits_to_float(t)  # (G, 2)
        if np.all(fracs == 0.0):
            outs.append(v[:, 0])
            continue
        a, b = v[:, 0], v[:, 1]
        diff = b - a
        tt = jnp.asarray(fracs.astype(np.float32))
        # numpy _lerp's two-sided formula, vectorized with STATIC per-slice
        # branch selection (frac is compile-time) — bit-identical to the
        # scalar _numpy_lerp per slice
        hi = jnp.asarray(fracs >= 0.5)
        lerp = jnp.where(hi, b - diff * (jnp.float32(1) - tt), a + diff * tt)
        outs.append(jnp.where(jnp.asarray(fracs == 0.0), a, lerp))
    return outs


def percentile_abs_batched(stacked, percentile, radix_bits: int | None = None):
    """Exact np.percentile(|stacked[g]|, percentile) independently for each
    slice of a same-shape stack, as ONE natural-layout descent: every step
    is a single fused reduction over the middle axes with each slice's own
    candidate prefixes on a trailing broadcast axis.  Used by the gang
    encode so a group of G same-shape layers costs ceil(32/d) kernels, not
    G * ceil(32/d).  Returns (G,) float32 thresholds, bit-identical to the
    per-slice ``percentile_abs``."""
    return percentile_abs_stacks([stacked], percentile, radix_bits)[0]


def kth_smallest_bits_sliced(bits, ks, radix_bits: int | None = None):
    """Per-slice radix select over a (G, ...) uint32 stack: returns (G,)
    uint32 where entry g is the ``ks[g]``-th smallest (0-indexed) value of
    slice ``bits[g]``.  Each descent step is ONE fused natural-layout
    reduction over the whole stack (candidates on a trailing broadcast
    axis), like ``percentile_abs_batched`` but with an independent rank per
    slice — the engine behind the gang-encoded min-weight / random pruning
    masks (count-threshold selection without sort or scatter).

    ``ks[g] == -1`` is valid and resolves to prefix 0 (used for
    prune_count == 0: the resulting strict-below mask is empty)."""
    d = NATURAL_RADIX_BITS if radix_bits is None else radix_bits
    g = bits.shape[0]
    ks = jnp.asarray(ks, jnp.int32).reshape(g)
    mid_axes = tuple(range(1, bits.ndim))
    t = jnp.zeros((g,), jnp.uint32)
    pos = 32
    while pos > 0:
        width = min(d, pos)
        pos -= width
        ms = jnp.arange(1, 1 << width, dtype=jnp.uint32)
        cand = t[:, None] | (ms[None, :] << jnp.uint32(pos))  # (G, M)
        bcast = cand.reshape((g,) + (1,) * (bits.ndim - 1) + (cand.shape[1],))
        cnt = jnp.sum(bits[..., None] < bcast, axis=mid_axes).astype(
            jnp.int32)  # (G, M)
        keep = cnt <= ks[:, None]
        t = jnp.max(jnp.where(keep, cand, t[:, None]), axis=1)
    return t


def percentile_abs_grouped(arrs, percentiles, interpret: bool = False,
                           radix_bits: int | None = None):
    """INDEPENDENT exact np.percentile(|a_i|, p_i) for a list of arrays,
    traced as one program so a whole checkpoint's per-layer thresholds
    (reference semantics: one np.percentile per layer,
    /root/reference/ResNet/dwt_pruning.py:67-73) compile into one fused
    sweep.  Each leaf dispatches to the best strategy for its layout
    (Pallas count kernel / natural-layout XLA descent / flat descent).

    ``percentiles``: one static float per array (or a single float).
    Returns a (L,) float32 vector of thresholds, bit-identical to the
    per-array ``percentile_abs``.  ``interpret`` forces the Pallas count
    path in interpreter mode (tests)."""
    L = len(arrs)
    if not isinstance(percentiles, (list, tuple)):
        percentiles = [percentiles] * L
    thrs = []
    for a, p in zip(arrs, percentiles):
        n = a.size
        rank = _numpy_rank(float(p), n, a.dtype)
        k = int(rank)
        frac = rank - k
        ks = (k, min(k + 1, n - 1))
        if interpret or _use_pallas_select([a], None):
            t = _kth_smallest_bits_pallas([_bits_of_abs(a)], ks,
                                          interpret=interpret,
                                          radix_bits=radix_bits)
        elif _use_natural([a], None):
            t = _kth_smallest_bits_natural([a], ks, radix_bits=radix_bits)
        else:
            t = _kth_smallest_bits(_bits_of_abs(a).ravel(), ks)
        thrs.append(_numpy_lerp(_bits_to_float(t), frac))
    return jnp.stack(thrs)


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _use_pallas_select(leaves, axis_name) -> bool:
    """Pallas count kernel only pays off when every leaf's flat (N/128, 128)
    view is relayout-free — i.e. its natural minor dim is already
    lane-aligned.  Conv-shaped leaves (…, 3, 3) take the natural-layout XLA
    descent instead (retiling them costs ~10 ms/45 MB, measured)."""
    if axis_name is not None:
        return False
    n = sum(l.size for l in leaves)
    if not (1 << 18) <= n < (1 << 31):
        return False
    for l in leaves:
        if l.ndim == 0:
            return False
        if l.shape[-1] % 128 == 0 and l.size % 1024 == 0:
            continue  # exactly tile-aligned
        if l.ndim >= 2 and l.shape[-1] >= 256:
            continue  # count_below sentinel-pads the natural 2-D view
        return False
    return _on_tpu()


def _use_natural(leaves, axis_name) -> bool:
    n = sum(l.size for l in leaves)
    return axis_name is None and n < (1 << 31) and _on_tpu()


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
    elif axis_name is not None and n < (1 << 31):
        t = _kth_smallest_bits_natural([x], ks, axis_name=axis_name)
    elif _use_natural([x], axis_name):
        t = _kth_smallest_bits_natural([x], ks)
    else:
        t = _kth_smallest_bits(_bits_of_abs(x).ravel(), ks, axis_name)
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
                          total_size: int | None = None,
                          pad_zeros: int = 0):
    """Global percentile of |values| across every leaf of a pytree (the
    sharded-subband representation of a wavedec2 result).

    ``pad_zeros`` (static): number of VIRTUAL zero elements participating in
    the percentile without being materialized — the mosaic padding the
    reference's coeffs_to_array adds at levels whose subbands don't tile
    (see ops/dwt_jax.mosaic_pad_count).  Zeros sort first in |·| order, so a
    padded rank j maps to the real order statistic j - pad_zeros (or to 0.0
    when j lands inside the padding) — exact parity with a percentile over
    the padded mosaic, at zero HBM cost.

    ``pad_zeros`` may be NEGATIVE: when the leaves are tile-padded subbands
    whose pad cells are physical EXACT zeros (filterbank ``padded_out``),
    pass ``mosaic_pad - physical_pad``.  Both pad populations sort first
    like any zero, so rank j over (real + mosaic) equals rank
    j - mosaic + physical over (real + physical) — the same arithmetic,
    signed."""
    leaves = jax.tree_util.tree_leaves(tree)
    n = total_size if total_size is not None else sum(l.size for l in leaves)
    n += pad_zeros
    rank = _numpy_rank(percentile, n, leaves[0].dtype)
    k = int(rank)
    frac = rank - k
    j2 = min(k + 1, n - 1)
    if pad_zeros:
        ka, kb = k - pad_zeros, j2 - pad_zeros
        if kb < 0 or (ka < 0 and frac == 0.0):
            # both order statistics are padding zeros
            return jnp.zeros((), jnp.float32)
        ks = (max(ka, 0), max(kb, 0))
    else:
        ks = (k, j2)
    if _use_pallas_select(leaves, axis_name):
        # per-leaf counting: no concatenated copy of the coefficients
        t = _kth_smallest_bits_pallas([_bits_of_abs(l) for l in leaves], ks)
    elif axis_name is not None and n < (1 << 31):
        t = _kth_smallest_bits_natural(leaves, ks, axis_name=axis_name)
    elif _use_natural(leaves, axis_name):
        t = _kth_smallest_bits_natural(leaves, ks)
    else:
        bits = jnp.concatenate([_bits_of_abs(l).ravel() for l in leaves])
        t = _kth_smallest_bits(bits, ks, axis_name)
    v = _bits_to_float(t)
    if pad_zeros and k - pad_zeros < 0:
        # lower statistic sits inside the virtual padding: lerp from 0
        v = v.at[0].set(0.0)
    return _numpy_lerp(v, frac)
