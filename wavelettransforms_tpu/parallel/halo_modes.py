"""Mesh-sharded multi-level DWT prune for NON-PERIODIZATION boundary modes.

``halo.py`` covers ``mode='periodization'``, where the ring wraparound IS the
boundary condition.  This module extends the sharded encode -> global
percentile -> decode pipeline to pywt's VALID-SIZE modes — ``symmetric``
(the BASELINE.json north star's boundary extension), ``reflect``, ``zero``,
``constant``, ``periodic`` — where subband lengths are the valid-mode
``(n + F - 1) // 2`` — they do NOT halve exactly, so shards become RAGGED:

  * interior shards always hold ``L_k = L / 2**k`` real coefficients
    (L = local input length, constrained even through every level);
  * the LAST shard along a sharded axis holds ``r_k`` real coefficients with
    ``r_{k+1} = (r_k + F - 1) // 2`` — up to ``F`` more than interior shards.

All raggedness is STATIC: shard buffers carry a fixed tail of ``F`` slack
columns, real lengths per level are compile-time integers, and per-shard
behavior (edge reflection vs neighbor halo, real-length masks) is selected
with ``axis_index`` at trace time.  Collectives per level per sharded axis:

  * analysis: ONE non-wrapping ``ppermute`` (left halo of ``F - 2`` columns;
    the global left edge reflects its own head, the global right edge
    reflects its own tail — pywt half-sample symmetry, verified against
    ops/dwt_numpy._extension_indices).  The level's two axis-1 half-passes
    are stacked so the whole level costs ONE collective per sharded axis;
  * synthesis: ONE non-wrapping ``ppermute`` (right halo of ``(F - 1) // 2``
    coefficients; the valid-mode synthesis reads no left halo because odd
    upsampled slots are zero, and global edges zero-pad exactly like the
    unsharded full correlation).  cA/cD — and, batched at the call site,
    all four of the level's subbands — share the one permute.

The global percentile masks each shard's slack tail to +inf (never counted
below any finite candidate) and feeds the REAL coefficient count plus the
reference's mosaic-padding zeros (virtual, dj.mosaic_pad_count) into
parallel.quantile.percentile_abs_pytree — bit-identical thresholds to the
unsharded engine path (/root/reference/ResNet/dwt_pruning.py:67-73
semantics).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..wavelets import Wavelet, get_wavelet
from ..ops import dwt_jax as dj
from ..ops.dwt_jax import _conv1d_last
from .quantile import percentile_abs_pytree

VALID_MODES = ("symmetric", "reflect", "zero", "constant", "periodic")


def _edge_left(x, hL: int, mode: str):
    """Boundary extension columns PRECEDING column 0 of the global signal
    (width hL, in signal order) — pywt conventions, verified against
    ops/dwt_numpy._extension_indices."""
    if mode == "symmetric":      # ... x1 x0 | x0 x1 ...
        return jnp.flip(x[..., :hL], -1)
    if mode == "reflect":        # ... x2 x1 | x0 x1 ...
        return jnp.flip(x[..., 1:hL + 1], -1)
    if mode == "zero":
        return jnp.zeros_like(x[..., :hL])
    if mode == "constant":       # edge replication
        return jnp.broadcast_to(x[..., :1], x.shape[:-1] + (hL,))
    raise ValueError(mode)       # periodic is handled with ring permutes


def _edge_right(x, l_last: int, width: int, mode: str):
    """Boundary extension columns FOLLOWING the last real column ``l_last``
    of the global signal (width ``width``, in signal order)."""
    if mode == "symmetric":      # ... x_{n-1} | x_{n-1} x_{n-2} ...
        return jnp.flip(x[..., l_last - width:l_last], -1)
    if mode == "reflect":        # ... x_{n-1} | x_{n-2} x_{n-3} ...
        return jnp.flip(x[..., l_last - 1 - width:l_last - 1], -1)
    if mode == "zero":
        return jnp.zeros_like(x[..., :width])
    if mode == "constant":
        return jnp.broadcast_to(x[..., l_last - 1:l_last],
                                x.shape[:-1] + (width,))
    raise ValueError(mode)


# ---------------------------------------------------------------------------
# Static shard-size bookkeeping
# ---------------------------------------------------------------------------

class _AxisPlan:
    """Per-sharded-axis real-length schedule: level k coefficients hold
    ``interior[k]`` real entries on shards 0..nd-2 and ``last[k]`` on the
    final shard, inside buffers of ``buf[k]`` (uniform across shards)."""

    def __init__(self, local_len: int, n_dev: int, level: int, F: int,
                 mode: str = "symmetric"):
        if local_len % (1 << level):
            raise ValueError(
                f"local shard length {local_len} must stay even through "
                f"{level} level(s): need {local_len} % {1 << level} == 0")
        self.interior = [local_len]
        self.last = [local_len]
        self.buf = [local_len]
        for _ in range(level):
            li = self.interior[-1] // 2
            lr = (self.last[-1] + F - 1) // 2
            self.interior.append(li)
            self.last.append(lr)
            # TIGHT buffer = the last shard's exact real length (the old
            # li + F slack inflated every coefficient-space op by up to
            # (F-1)/li per axis per level — a large share of the r4 27.7%
            # sharded-symmetric overhead at 8 devices); the synthesis pads
            # its own F-column extension window locally when needed
            self.buf.append(max(li, lr))
        # periodic's right extension is fetched from shard 0's head
        # (F-1 real cols); reflect reads F-1 head cols on the left edge and
        # skips the edge sample on the right
        need_int = F - 1 if mode in ("periodic", "reflect") else F - 2
        need_last = F if mode == "reflect" else F - 1
        for k in range(1, level + 1):
            if self.interior[k] < need_int or self.last[k] < need_last:
                raise ValueError(
                    f"level {k}: local shard lengths "
                    f"({self.interior[k]}/{self.last[k]}) too short for "
                    f"filter length {F} halos/reflections — use fewer "
                    "devices or levels")


# ---------------------------------------------------------------------------
# 1-D sharded valid-mode passes (last axis)
# ---------------------------------------------------------------------------

def _sym_dwt_last_sharded(bands, w: Wavelet, axis_name: str,
                          l_int: int, l_last: int, buf_out: int,
                          mode: str = "symmetric"):
    """Single-level valid-size-mode DWT along the (sharded) last axis of a
    TUPLE of equal-shape band buffers.

    Each band: (..., B) buffer with ``l_int`` real columns on interior
    shards and ``l_last`` on the final shard (garbage beyond).  Returns a
    tuple of (cA, cD) pairs of width ``buf_out`` (same ragged convention).

    All bands share ONE halo ``ppermute``: the (small) F-2-column tails are
    packed along the last axis before the collective — a level's two
    half-passes cost one collective per sharded axis instead of one per
    band (r4 SCALING: per-band permutes were a large share of the 27.7%
    sharded-symmetric overhead).

    Output k (shard-local) reads extended-signal columns [2k, 2k + F), where
    the extension is [left halo of F-2 | real | right reflection] — exactly
    ops/dwt_numpy._extension_indices(mode='symmetric') restricted to this
    shard's output range.
    """
    F = w.dec_len
    hL = F - 2
    nd = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)
    dtype = bands[0].dtype
    dec_lo = jnp.asarray(w.dec_lo[::-1].copy(), dtype=dtype)
    dec_hi = jnp.asarray(w.dec_hi[::-1].copy(), dtype=dtype)
    nbands = len(bands)

    lefts = [None] * nbands
    if hL:
        # every shard sends its (real) tail rightward; the global left edge
        # takes its boundary extension instead — except 'periodic', whose
        # left extension IS the global tail: wrap the ring like halo.py
        if mode == "periodic":
            tails = [jnp.where(idx == nd - 1, x[..., l_last - hL:l_last],
                               x[..., l_int - hL:l_int]) for x in bands]
            packed = jnp.concatenate(tails, -1) if nbands > 1 else tails[0]
            left_p = lax.ppermute(packed, axis_name,
                                  [(i, (i + 1) % nd) for i in range(nd)])
            lefts = [left_p[..., i * hL:(i + 1) * hL] for i in range(nbands)]
        else:
            packed = jnp.concatenate(
                [x[..., l_int - hL:l_int] for x in bands], -1
            ) if nbands > 1 else bands[0][..., l_int - hL:l_int]
            left_p = lax.ppermute(packed, axis_name,
                                  [(i, i + 1) for i in range(nd - 1)])
            lefts = [jnp.where(idx == 0, _edge_left(x, hL, mode),
                               left_p[..., i * hL:(i + 1) * hL])
                     for i, x in enumerate(bands)]
    if mode == "periodic":
        # right extension = global head = shard 0's first F-1 real columns
        packed_h = (jnp.concatenate([x[..., :F - 1] for x in bands], -1)
                    if nbands > 1 else bands[0][..., :F - 1])
        right_p = lax.ppermute(packed_h, axis_name, [(0, nd - 1)])
        rights = [right_p[..., i * (F - 1):(i + 1) * (F - 1)]
                  for i in range(nbands)]

    outs = []
    for bi, x in enumerate(bands):
        # body: interior shards' outputs never read past their real columns
        # (max read = l_int - 1 in body coords); the last shard appends the
        # right boundary extension AT column l_last.  Interior shards never
        # read columns >= l_int (<= l_last), so the ext region is harmless
        # finite junk there — written UNCONDITIONALLY into the tail (no
        # full-array per-shard select).
        ext = (rights[bi] if mode == "periodic"
               else _edge_right(x, l_last, F - 1, mode))
        pad_to = max(x.shape[-1], l_last + F - 1)
        body = x if x.shape[-1] == pad_to else jnp.pad(
            x, [(0, 0)] * (x.ndim - 1) + [(0, pad_to - x.shape[-1])])
        body = lax.dynamic_update_slice_in_dim(body, ext.astype(body.dtype),
                                               l_last, axis=-1)
        xe = (jnp.concatenate([lefts[bi], body], -1) if hL else body)

        def to_buf(t):
            d = buf_out - t.shape[-1]
            if d > 0:
                t = jnp.pad(t, [(0, 0)] * (t.ndim - 1) + [(0, d)])
            return t[..., :buf_out]

        outs.append((to_buf(_conv1d_last(xe, dec_lo, 2)),
                     to_buf(_conv1d_last(xe, dec_hi, 2))))
    return tuple(outs)


def _sym_idwt_last_sharded(pairs, w: Wavelet, axis_name: str,
                           c_int: int, c_last: int, buf_out: int):
    """Single-level symmetric-mode synthesis along the (sharded) last axis
    of a TUPLE of (cA, cD) pairs.

    Valid-mode synthesis x[i] = sum_m u[m] rec[i + F - 2 - m] (u = zero-
    upsampled coefficients) — shard-local output i reads coefficient columns
    [ceil((i-1)/2), (i + F - 2) // 2]: a RIGHT halo of (F-1)//2 columns and
    no left halo.  Global edges zero-pad, exactly like the unsharded full
    correlation (ops/dwt_jax._idwt_last_conv valid path).

    ALL subbands of a level share ONE halo ``ppermute``: the hR-column
    heads are packed along the last axis before the collective (r4
    SCALING: per-band permutes were a large share of the 27.7%
    sharded-symmetric overhead).  Returns a tuple of synthesized bands.
    """
    F = w.rec_len
    hR = (F - 1) // 2
    nd = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)
    dtype = pairs[0][0].dtype
    rec_lo = jnp.asarray(w.rec_lo[::-1].copy(), dtype=dtype)
    rec_hi = jnp.asarray(w.rec_hi[::-1].copy(), dtype=dtype)
    arrs = [c for pair in pairs for c in pair]

    # zero the slack tail: garbage must contribute exactly the zeros the
    # unsharded u has beyond the real coefficient range
    cols = jnp.arange(arrs[0].shape[-1])
    real = jnp.where(idx == nd - 1, c_last, c_int)
    mask = (cols < real).astype(dtype)
    arrs = [c * mask for c in arrs]

    # extension of F columns appended DIRECTLY AFTER column c_int (global
    # coefficient coordinates are c_int-strided): interior shards put the
    # right-neighbor's head (hR real halo columns) there; the LAST shard
    # puts its own surplus coefficients (columns c_int..c_last, already
    # masked to zero beyond) — its halo would be the zeros past the global
    # end, which the masked surplus already is beyond c_last.  Buffers are
    # TIGHT (= the last shard's real length), so the F-column window may
    # need a local zero-pad first.
    ext_len = F
    need = c_int + ext_len
    if hR:
        packed = (jnp.concatenate([c[..., :hR] for c in arrs], -1)
                  if len(arrs) > 1 else arrs[0][..., :hR])
        right_p = lax.ppermute(packed, axis_name,
                               [(i + 1, i) for i in range(nd - 1)])

    outs = []
    for ai, c in enumerate(arrs):
        if c.shape[-1] < need:
            c = jnp.pad(c, [(0, 0)] * (c.ndim - 1)
                        + [(0, need - c.shape[-1])])
        if hR:
            halo_ext = jnp.pad(
                right_p[..., ai * hR:(ai + 1) * hR],
                [(0, 0)] * (c.ndim - 1) + [(0, ext_len - hR)])
        else:
            halo_ext = jnp.zeros(c.shape[:-1] + (ext_len,), dtype)
        own_ext = c[..., c_int:c_int + ext_len]
        ext = jnp.where(idx == nd - 1, own_ext, halo_ext)
        outs.append(jnp.concatenate([c[..., :c_int], ext], -1))

    def upsample(c):
        z = jnp.zeros_like(c)
        u = jnp.stack([c, z], axis=-1).reshape(c.shape[:-1]
                                               + (2 * c.shape[-1],))
        # prepend one zero: x[i] = sum_j rec_rev[j] u[i - 1 + j]
        return jnp.pad(u, [(0, 0)] * (c.ndim - 1) + [(1, 0)])

    ys = []
    for pi in range(len(pairs)):
        ua = upsample(outs[2 * pi])
        ud = upsample(outs[2 * pi + 1])
        y = _conv1d_last(ua, rec_lo, 1) + _conv1d_last(ud, rec_hi, 1)
        d = buf_out - y.shape[-1]
        if d > 0:
            y = jnp.pad(y, [(0, 0)] * (y.ndim - 1) + [(0, d)])
        ys.append(y[..., :buf_out])
    return tuple(ys)


def _local_valid(x, w: Wavelet, axis: int, mode: str):
    """Unsharded valid-mode DWT along ``axis`` (whole axis local)."""
    return dj.dwt(x, w, mode, axis=axis)


# ---------------------------------------------------------------------------
# 2-D tiled multi-level transform + prune
# ---------------------------------------------------------------------------

def sharded_wavedec2_sym_tiled(x_local, wavelet, level: int, axis_names,
                               plans, mode: str = "symmetric"):
    """Multi-level symmetric-mode 2-D DWT on a (possibly 2-D) tiled shard.
    Call inside shard_map.  Returns the subband pytree [cA, (cH,cV,cD)...]
    with RAGGED buffers (see module docstring); real lengths per level come
    from ``plans`` (an _AxisPlan per spatial axis, None = unsharded axis)."""
    w = get_wavelet(wavelet) if isinstance(wavelet, str) else wavelet
    name0, name1 = axis_names
    p0, p1 = plans

    def dwt_axis(bands, axis, name, plan, k):
        """Transform a tuple of bands along one axis; sharded axes share a
        single packed-tail halo collective across all bands."""
        if name is None:
            return tuple(_local_valid(t, w, axis, mode) for t in bands)
        moved = tuple(jnp.moveaxis(t, axis, -1) for t in bands)
        outs = _sym_dwt_last_sharded(moved, w, name, plan.interior[k],
                                     plan.last[k], plan.buf[k + 1],
                                     mode=mode)
        return tuple((jnp.moveaxis(ca, -1, axis), jnp.moveaxis(cd, -1, axis))
                     for ca, cd in outs)

    coeffs = []
    a = x_local
    for k in range(level):
        ((a0, d0),) = dwt_axis((a,), -2, name0, p0, k)
        (aa, ad), (da, dd) = dwt_axis((a0, d0), -1, name1, p1, k)
        coeffs.append((da, ad, dd))
        a = aa
    return [a] + coeffs[::-1]


def sharded_waverec2_sym_tiled(coeffs, wavelet, level: int, axis_names,
                               plans, mode: str = "symmetric"):
    """Inverse of sharded_wavedec2_sym_tiled (crop-to-detail between levels
    is pure static bookkeeping: real lengths revert to the analysis-side
    schedule, garbage columns are re-masked by the next level's synthesis)."""
    w = get_wavelet(wavelet) if isinstance(wavelet, str) else wavelet
    name0, name1 = axis_names
    p0, p1 = plans

    def idwt_axis(pairs, axis, name, plan, k):
        # synthesizing level-(k+1) coefficients back to level-k length;
        # sharded axes: ONE packed-head ppermute for every subband of the
        # level's pairs
        if name is None:
            return tuple(dj.idwt(ca, cd, w, mode, axis=axis)
                         for ca, cd in pairs)
        moved = tuple((jnp.moveaxis(ca, axis, -1),
                       jnp.moveaxis(cd, axis, -1)) for ca, cd in pairs)
        ys = _sym_idwt_last_sharded(moved, w, name, plan.interior[k + 1],
                                    plan.last[k + 1], plan.buf[k])
        return tuple(jnp.moveaxis(y, -1, axis) for y in ys)

    a = coeffs[0]
    for i, (da, ad, dd) in enumerate(coeffs[1:]):
        k = level - 1 - i  # synthesizing from level k+1 down to level k
        # crop a to the detail band's buffer shape (the coarser synthesis
        # returned buf[k+1]-wide buffers == detail width; raggedness beyond
        # the detail's real length is masked inside the synthesis passes)
        for ax in (-2, -1):
            if a.shape[ax] > da.shape[ax]:
                a = lax.slice_in_dim(a, 0, da.shape[ax], axis=ax % a.ndim)
        a0, d0 = idwt_axis(((a, ad), (da, dd)), -1, name1, p1, k)
        (a,) = idwt_axis(((a0, d0),), -2, name0, p0, k)
    return a


def _real_mask(shape, axis_names, plans, k):
    """Multiplicative {0,1} mask of the REAL region of a level-k subband
    buffer (1 = real coefficient, 0 = slack), per-shard via axis_index."""
    m = None
    for sp_ax, name, plan in zip((-2, -1), axis_names, plans):
        if name is None:
            continue
        nd = lax.axis_size(name)
        idx = lax.axis_index(name)
        real = jnp.where(idx == nd - 1, plan.last[k], plan.interior[k])
        ax = sp_ax % len(shape)
        col = jnp.arange(shape[ax])
        col = col.reshape((-1,) + (1,) * (len(shape) - 1 - ax))
        mm = (col < real)
        m = mm if m is None else (m & mm)
    return m


def sharded_dwt_prune_sym_tiled(x_local, wavelet, level: int,
                                percentile: float, axis_names, plans,
                                total_real: int, pad_zeros: int,
                                mode: str = "symmetric"):
    """Full sharded symmetric-mode encode -> ONE global percentile ->
    fused-threshold decode for one (tiled) tensor shard.  Reference
    semantics: one percentile over the PADDED mosaic of the whole tensor
    (slack entries are masked to +inf so only real coefficients and the
    virtual mosaic-padding zeros participate)."""
    w = get_wavelet(wavelet) if isinstance(wavelet, str) else wavelet
    coeffs = sharded_wavedec2_sym_tiled(x_local, wavelet, level, axis_names,
                                        plans, mode)
    psum_axes = tuple(n for n in axis_names if n is not None)
    psum_name = (psum_axes if len(psum_axes) > 1
                 else (psum_axes[0] if psum_axes else None))

    inf = jnp.asarray(jnp.inf, x_local.dtype)
    masked = []
    levels = [level] + [lv for lv in range(level, 0, -1) for _ in range(3)]
    leaves = [coeffs[0]] + [b for det in coeffs[1:] for b in det]
    for leaf, lv in zip(leaves, levels):
        m = _real_mask(leaf.shape, axis_names, plans, lv)
        masked.append(leaf if m is None else jnp.where(m, leaf, inf))

    thr = percentile_abs_pytree(masked, float(percentile),
                                axis_name=psum_name, total_size=total_real,
                                pad_zeros=pad_zeros)
    pruned_leaves = [
        jnp.where(jnp.abs(c) < thr, jnp.zeros((), c.dtype), c)
        for c in leaves
    ]
    pruned = [pruned_leaves[0]] + [
        tuple(pruned_leaves[1 + 3 * i: 4 + 3 * i])
        for i in range(level)
    ]
    return sharded_waverec2_sym_tiled(pruned, wavelet, level, axis_names,
                                      plans, mode), thr


def run_sharded_prune_sym(x, wavelet: str, level: int, percentile: float,
                          mesh: Mesh, axis_names=("row", "col"),
                          mode: str = "symmetric"):
    """Driver (BASELINE config 4 with SYMMETRIC boundary extension): tile
    both spatial axes of ``x`` over the named 2-D mesh axes, run the
    halo-exchange symmetric-mode prune with a two-axis psum percentile, and
    return the de-slacked global result (same shape as ``x``) plus the
    threshold.  Either axis name may be None for an unsharded spatial axis.

    Equivalence contract (tested): bit-identical threshold and
    reconstruction to the unsharded engine prune
    (prune.dwt_prune.dwt_prune_tensor, mode='symmetric') for any mesh shape.
    """
    from jax.experimental.shard_map import shard_map

    if mode not in VALID_MODES:
        raise ValueError(f"mode {mode!r} not in {VALID_MODES} "
                         "(use parallel.halo for 'periodization')")
    w = get_wavelet(wavelet)
    F = w.dec_len
    ndim = x.ndim
    spec = [None] * ndim
    n_devs = []
    for sp_ax, name in zip((-2, -1), axis_names):
        if name is None:
            n_devs.append(1)
            continue
        nd = mesh.shape[name]
        n_devs.append(nd)
        if x.shape[sp_ax] % nd:
            raise ValueError(
                f"spatial axis of length {x.shape[sp_ax]} must divide the "
                f"'{name}' mesh axis ({nd})")
        spec[sp_ax % ndim] = name
    plans = []
    for sp_ax, name, nd in zip((-2, -1), axis_names, n_devs):
        plans.append(None if name is None
                     else _AxisPlan(x.shape[sp_ax] // nd, nd, level, F,
                                    mode))
    pspec = P(*spec)

    h, wd = x.shape[-2], x.shape[-1]
    lead = int(np.prod(x.shape[:-2], dtype=np.int64) or 1)
    shapes = dj.subband_shapes(h, wd, wavelet, level, mode)
    total_real = (shapes[-1][0] * shapes[-1][1]
                  + sum(3 * sh * sw for sh, sw in shapes)) * lead
    pad_zeros = dj.mosaic_pad_count(h, wd, wavelet, level, mode) * lead

    fn = shard_map(
        functools.partial(
            sharded_dwt_prune_sym_tiled, wavelet=wavelet, level=level,
            percentile=percentile, axis_names=tuple(axis_names),
            plans=plans, total_real=int(total_real),
            pad_zeros=int(pad_zeros), mode=mode),
        mesh=mesh, in_specs=(pspec,), out_specs=(pspec, P()),
        check_rep=False)
    y, thr = jax.jit(fn)(jax.device_put(x, NamedSharding(mesh, pspec)))

    # de-slack sharded axes (drop each shard's slack tail columns); crop
    # unsharded axes (local valid synthesis overshoots like pywt.waverec2)
    for sp_ax, name, nd, plan in zip((-2, -1), axis_names, n_devs, plans):
        ax = sp_ax % ndim
        if name is None:
            if y.shape[ax] > x.shape[ax]:
                y = lax.slice_in_dim(y, 0, x.shape[ax], axis=ax)
            continue
        B = y.shape[ax] // nd
        L = plan.interior[0]
        if B != L:
            pieces = [lax.slice_in_dim(y, s * B, s * B + L, axis=ax)
                      for s in range(nd)]
            y = jnp.concatenate(pieces, axis=ax)
    return y, thr
