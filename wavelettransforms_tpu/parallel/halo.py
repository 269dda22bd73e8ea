"""Mesh-sharded multi-level DWT with collective halo exchange.

TPU-native scaling of the encode path (BASELINE.json configs 4-5): a large 2-D
weight tensor is sharded across a mesh axis along one spatial dimension; each
level of the filter bank needs ``dec_len/2 - 1`` boundary columns from each
ring neighbor, exchanged with ``lax.ppermute``.  The ring wraparound IS the
periodization boundary condition, so sharded results match the unsharded
transform bit-for-bit (same local kernels, same accumulation order).

Representation note: the sharded path keeps coefficients as a subband pytree
[cA_L, (cH, cV, cD)_L..1] with every subband sharded along the same axis —
(the packed-mosaic view is only meaningful unsharded).  Global percentile over
the sharded pytree uses parallel.quantile.percentile_abs_pytree (psum'd radix
select), preserving the reference's one-threshold-per-tensor semantics.
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


def _ring_halo_last(x, h_left: int, h_right: int, axis_name: str):
    """Exchange halo slices along the last array axis over a ring mesh axis.

    Returns concat([left_halo, x, right_halo]) where left_halo is the LEFT
    ring neighbor's rightmost ``h_left`` columns (wrapping — periodization).
    """
    n_dev = lax.axis_size(axis_name)
    parts = [x]
    if h_left:
        src = x[..., -h_left:]
        # send to my RIGHT neighbor -> I receive from my LEFT neighbor
        perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]
        parts.insert(0, lax.ppermute(src, axis_name, perm))
    if h_right:
        src = x[..., :h_right]
        perm = [(i, (i - 1) % n_dev) for i in range(n_dev)]
        parts.append(lax.ppermute(src, axis_name, perm))
    return jnp.concatenate(parts, axis=-1) if len(parts) > 1 else x


def _dwt_last_sharded(x, w: Wavelet, axis_name: str):
    """Single-level periodization DWT along the (sharded) last axis.

    Local length must be even.  Identical math to dwt_jax._dwt_last_conv with
    the circular wrap replaced by the ring halo.
    """
    F = w.dec_len
    if x.shape[-1] % 2:
        raise ValueError(
            f"sharded DWT needs an even local shard length along the "
            f"transform axis; got local length {x.shape[-1]} — choose a "
            "device count / level so every level's local length stays even")
    h = F // 2 - 1
    xe = _ring_halo_last(x, h, h, axis_name)
    dec_lo = jnp.asarray(w.dec_lo[::-1].copy(), dtype=x.dtype)
    dec_hi = jnp.asarray(w.dec_hi[::-1].copy(), dtype=x.dtype)
    return _conv1d_last(xe, dec_lo, 2), _conv1d_last(xe, dec_hi, 2)


def _idwt_last_sharded(cA, cD, w: Wavelet, axis_name: str):
    F = w.rec_len
    n = cA.shape[-1]
    rec_lo = jnp.asarray(w.rec_lo[::-1].copy(), dtype=cA.dtype)
    rec_hi = jnp.asarray(w.rec_hi[::-1].copy(), dtype=cA.dtype)
    z = jnp.zeros_like(cA)
    ua = jnp.stack([cA, z], axis=-1).reshape(cA.shape[:-1] + (2 * n,))
    ud = jnp.stack([cD, z], axis=-1).reshape(cD.shape[:-1] + (2 * n,))
    off = F // 2
    ua = _ring_halo_last(ua, off, F - 1 - off, axis_name)
    ud = _ring_halo_last(ud, off, F - 1 - off, axis_name)
    return _conv1d_last(ua, rec_lo, 1) + _conv1d_last(ud, rec_hi, 1)


def _local_dwt(x, w: Wavelet, axis: int, axis_name: str | None):
    """DWT along ``axis``; halo-sharded when axis_name given, local otherwise."""
    if axis_name is None:
        return dj.dwt(x, w, "periodization", axis=axis)
    xm = jnp.moveaxis(x, axis, -1)
    cA, cD = _dwt_last_sharded(xm, w, axis_name)
    return jnp.moveaxis(cA, -1, axis), jnp.moveaxis(cD, -1, axis)


def _local_idwt(cA, cD, w: Wavelet, axis: int, axis_name: str | None):
    if axis_name is None:
        return dj.idwt(cA, cD, w, "periodization", axis=axis)
    am = jnp.moveaxis(cA, axis, -1)
    dm = jnp.moveaxis(cD, axis, -1)
    y = _idwt_last_sharded(am, dm, w, axis_name)
    return jnp.moveaxis(y, -1, axis)


def _names_for(shard_axis: int, ndim: int, axes, axis_name: str):
    """Map a single sharded array axis to the per-spatial-axis name pair."""
    ax0, ax1 = axes
    name0 = axis_name if (shard_axis % ndim) == (ax0 % ndim) else None
    name1 = axis_name if (shard_axis % ndim) == (ax1 % ndim) else None
    return name0, name1


def sharded_wavedec2_tiled(x_local, wavelet, level: int, axis_names,
                           axes=(-2, -1)):
    """Multi-level 2-D periodization DWT on a 2-D TILED shard: ``axes[i]``
    is sharded over mesh axis ``axis_names[i]`` (either entry may be None
    for an unsharded spatial axis).  Call inside shard_map.  Returns the
    subband pytree with every subband tiled the same way — each level's
    row/column passes exchange their own ppermute halos per mesh axis."""
    w = get_wavelet(wavelet) if isinstance(wavelet, str) else wavelet
    ax0, ax1 = axes
    name0, name1 = axis_names
    coeffs = []
    a = x_local
    for _ in range(level):
        a0, d0 = _local_dwt(a, w, ax0, name0)
        aa, ad = _local_dwt(a0, w, ax1, name1)
        da, dd = _local_dwt(d0, w, ax1, name1)
        coeffs.append((da, ad, dd))
        a = aa
    return [a] + coeffs[::-1]


def sharded_waverec2_tiled(coeffs, wavelet, axis_names, axes=(-2, -1)):
    w = get_wavelet(wavelet) if isinstance(wavelet, str) else wavelet
    ax0, ax1 = axes
    name0, name1 = axis_names
    a = coeffs[0]
    for (da, ad, dd) in coeffs[1:]:
        a0 = _local_idwt(a, ad, w, ax1, name1)
        d0 = _local_idwt(da, dd, w, ax1, name1)
        a = _local_idwt(a0, d0, w, ax0, name0)
    return a


def sharded_wavedec2(x_local, wavelet, level: int, axis_name: str,
                     shard_axis: int = -2, axes=(-2, -1)):
    """Multi-level 2-D periodization DWT where ``axes[shard_axis idx]`` is
    sharded over ``axis_name``.  Call inside shard_map.  Returns the subband
    pytree with every subband sharded along the same axis."""
    return sharded_wavedec2_tiled(
        x_local, wavelet, level,
        _names_for(shard_axis, x_local.ndim, axes, axis_name), axes)


def sharded_waverec2(coeffs, wavelet, axis_name: str, shard_axis: int = -2,
                     axes=(-2, -1)):
    return sharded_waverec2_tiled(
        coeffs, wavelet,
        _names_for(shard_axis, coeffs[0].ndim, axes, axis_name), axes)


def sharded_dwt_prune(x_local, wavelet, level: int, percentile: float,
                      axis_name: str, total_size: int, shard_axis: int = -2):
    """Full sharded encode->global-threshold->decode for one tensor shard.

    Reference semantics at scale: ONE percentile over every coefficient of the
    (globally distributed) tensor.  ``percentile`` and ``total_coeff_size``
    are static.  Returns the pruned local shard.
    """
    names = _names_for(shard_axis, x_local.ndim, (-2, -1), axis_name)
    # shard_axis may point at a non-spatial (batch) axis: the transform is
    # then fully local, but the reference's one-global-threshold semantics
    # still require the percentile count to psum over the mesh axis.
    extra = axis_name if all(n is None for n in names) else None
    return sharded_dwt_prune_tiled(x_local, wavelet, level, percentile,
                                   names, total_size, psum_extra=extra)


def sharded_dwt_prune_tiled(x_local, wavelet, level: int, percentile: float,
                            axis_names, total_size: int,
                            psum_extra: str | None = None):
    """2-D tiled encode->global-threshold->decode: both spatial axes sharded
    (axis_names[i] shards spatial axis i; None = unsharded).  The global
    percentile's radix-count psum reduces over BOTH mesh axes at once.
    ``psum_extra`` names a mesh axis that shards a NON-spatial (batch) axis —
    it joins the percentile reduction but needs no halo exchange."""
    coeffs = sharded_wavedec2_tiled(x_local, wavelet, level, axis_names)
    psum_axes = tuple(n for n in axis_names if n is not None)
    if psum_extra is not None:
        psum_axes += (psum_extra,)
    if not psum_axes:
        psum_name = None  # fully local: no collective needed
    elif len(psum_axes) == 1:
        psum_name = psum_axes[0]
    else:
        psum_name = psum_axes
    thr = percentile_abs_pytree(
        coeffs, percentile, axis_name=psum_name, total_size=total_size)
    pruned = jax.tree_util.tree_map(
        lambda c: jnp.where(jnp.abs(c) < thr, jnp.zeros((), c.dtype), c),
        coeffs)
    return sharded_waverec2_tiled(pruned, wavelet, axis_names)


def coeff_tree_size(h: int, w: int, level: int) -> int:
    """Global coefficient count of the subband pytree for an (h, w) tensor
    (per mode, even dims: every level splits exactly)."""
    total = 0
    hh, ww = h, w
    for _ in range(level):
        ch, cw = (hh + 1) // 2, (ww + 1) // 2
        total += 3 * ch * cw
        hh, ww = ch, cw
    return total + hh * ww


def run_sharded_prune(x, wavelet: str, level: int, percentile: float,
                      mesh: Mesh, axis_name: str = "data",
                      shard_axis: int = -2):
    """Driver: shard ``x`` along ``shard_axis`` over ``mesh[axis_name]``, run
    the halo-exchange prune, return the (sharded) result as a global array."""
    from jax.experimental.shard_map import shard_map

    ndim = x.ndim
    n_dev = mesh.shape[axis_name]
    dim = x.shape[shard_axis % ndim]
    spatial = (shard_axis % ndim) in ((-2) % ndim, (-1) % ndim)
    if spatial and dim % (n_dev * (1 << level)):
        raise ValueError(
            f"axis of length {dim} sharded over {n_dev} devices must keep an "
            f"even local length through {level} level(s): need "
            f"{dim} % {n_dev * (1 << level)} == 0")
    if not spatial and dim % n_dev:
        raise ValueError(
            f"batch axis of length {dim} must divide the device count "
            f"{n_dev}")
    spec = [None] * ndim
    spec[shard_axis % ndim] = axis_name
    pspec = P(*spec)
    total = coeff_tree_size(x.shape[-2], x.shape[-1], level) * int(
        np.prod(x.shape[:-2], dtype=np.int64) or 1)

    fn = shard_map(
        functools.partial(
            sharded_dwt_prune, wavelet=wavelet, level=level,
            percentile=percentile, axis_name=axis_name,
            total_size=int(total), shard_axis=shard_axis),
        mesh=mesh, in_specs=(pspec,), out_specs=pspec)
    return jax.jit(fn)(jax.device_put(x, NamedSharding(mesh, pspec)))


def run_sharded_prune_2d(x, wavelet: str, level: int, percentile: float,
                         mesh: Mesh, axis_names=("row", "col")):
    """Driver for the 2-D TILED prune (BASELINE config 4: a large weight
    tensor tiled across a host with halo exchange): shard BOTH spatial axes
    of ``x`` over the named 2-D mesh axes, run the halo-exchange prune with
    a two-axis psum percentile, return the (tiled) global result.

    Either entry of ``axis_names`` may be None to leave that spatial axis
    unsharded (degenerates to the 1-D ``run_sharded_prune``)."""
    from jax.experimental.shard_map import shard_map

    ndim = x.ndim
    spec = [None] * ndim
    for sp_ax, name in zip((-2, -1), axis_names):
        if name is None:
            continue
        n_dev = mesh.shape[name]
        dim = x.shape[sp_ax]
        if dim % (n_dev * (1 << level)):
            raise ValueError(
                f"spatial axis of length {dim} tiled over {n_dev} devices "
                f"('{name}') must keep an even local length through {level} "
                f"level(s): need {dim} % {n_dev * (1 << level)} == 0")
        spec[sp_ax % ndim] = name
    pspec = P(*spec)
    total = coeff_tree_size(x.shape[-2], x.shape[-1], level) * int(
        np.prod(x.shape[:-2], dtype=np.int64) or 1)

    fn = shard_map(
        functools.partial(
            sharded_dwt_prune_tiled, wavelet=wavelet, level=level,
            percentile=percentile, axis_names=tuple(axis_names),
            total_size=int(total)),
        mesh=mesh, in_specs=(pspec,), out_specs=pspec)
    return jax.jit(fn)(jax.device_put(x, NamedSharding(mesh, pspec)))
