"""Selective (DWT) pruning — the TPU-native core of the framework.

Per tensor (reference semantics, /root/reference/ResNet/dwt_pruning.py:35-95):
  1. clamp the decomposition level to pywt's dwt_max_level of the *smaller*
     spatial dim (:12-13, :64-65);
  2. multi-level 2-D DWT over the spatial axes, channels batched;
  3. ONE percentile threshold over the |packed mosaic| of the whole tensor
     (:25-32, :67-73) — strict ``<`` comparison;
  4. inverse transform, crop to the original shape (:77-82);
  5. count exact zeros in the reconstruction (:88-89).

Tensors with fewer than two dims bypass the transform and are thresholded
directly (:58-62).

The whole sweep over a checkpoint ("gang encode") is one jitted program: XLA
sees every layer's analysis/threshold/synthesis at once and schedules them
together on the chip — the TPU-native replacement for the reference's
per-layer Python loop over pywt calls.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..ops import dwt_jax as dj
from ..ops import threshold as th
from ..wavelets import dwt_max_level, get_wavelet
from .api import LayerPruneStats, PruneStats, is_conv_kernel


def clamped_level(shape, wavelet, level: int) -> int:
    """min(level, dwt_max_level(min(spatial dims), dec_len)) — reference
    clamp (/root/reference/ResNet/dwt_pruning.py:64-65)."""
    return min(level, dwt_max_level(min(shape[-2:]), wavelet))


def _pallas_eligible(shape, mode: str, axes, level: int = 1,
                     wavelet: str = "bior4.4") -> bool:
    """Route spatial tensors through the fused Pallas kernels on TPU.

    Thresholds are MEASURED (scripts/bench_crossover.py, r5 table in
    ROUND_NOTES.md): whenever the kernels compile they win — 512^2 L2
    0.287 vs 0.395 ms XLA, 1024^2 L3 0.252 vs 1.56, 2048^2 L4 0.743 vs
    6.16, 4096^2 L4 2.71 vs ~60 — and every measured failure was a config
    where some level's subband extent drops below the 128-lane tile (the
    sub-128 fallback kernels do not compile on this toolchain).  Hence:

    * periodization, 128-aligned dims: eligible iff every level's subband
      stays >= 128 and aligned, i.e. both dims divisible by 128 << level;
    * periodization, ragged dims (circular-extension valid-kernel path,
      pads lanes internally): keep the >= 2^20-element floor with 4F
      coarsest-band head-room (4095^2 measured 3.86 ms vs ~22x-slower
      XLA);
    * valid-size modes (symmetric/reflect/zero/periodic/constant): tile-
      padded internally; >= 2^20 floor with 4F head-room (unmeasured
      below that — the reference's workload class starts at 1024x512,
      which symmetric covers via the direct edge-extension kernel)."""
    if axes != (-2, -1):
        return False
    try:
        import jax

        if jax.default_backend() != "tpu":
            return False
    except Exception:
        return False
    h, w = shape[-2], shape[-1]
    F = get_wavelet(wavelet).dec_len
    if mode == "periodization":
        if h % 128 == 0 and w % 128 == 0:
            q = 128 << level
            return (h % q == 0 and w % q == 0
                    and min(h, w) >> level >= max(128, 4 * F))
        if h * w < (1 << 20):
            return False
        hl_, wl_ = h, w
        for _ in range(level):  # pywt ceil-half cascade
            hl_ = (hl_ + 1) // 2
            wl_ = (wl_ + 1) // 2
        return min(hl_, wl_) >= 4 * F  # synthesis halo head-room
    if mode not in ("symmetric", "reflect", "zero", "periodic", "constant"):
        return False
    if h * w < (1 << 20):
        return False
    # valid sizes grow by (F-1)//2 per halving; keep the coarsest level
    # comfortably larger than the filter so kernel halos stay in range
    dh, dw = dj.subband_shapes(h, w, wavelet, level, mode)[-1]
    return min(dh, dw) >= 4 * F


def _dwt_prune_tensor_pallas(w, wavelet: str, level: int, percentile,
                             mode: str = "periodization",
                             coeff_dtype=jnp.float32):
    from ..ops.pallas import filterbank as fb

    from ..parallel.quantile import percentile_abs_pytree

    lead = w.shape[:-2]
    x = w.reshape((-1,) + w.shape[-2:]).astype(coeff_dtype)
    # exact numpy-parity percentile via radix selection (a full sort of a
    # 16M-element array costs ~10x more than 32 bandwidth-bound count
    # passes); the reference percentile runs over the PADDED mosaic, so the
    # padding zeros enter the rank virtually (never materialized)
    pad = dj.mosaic_pad_count(w.shape[-2], w.shape[-1], wavelet, level,
                              mode) * x.shape[0]
    if mode == "periodization":
        coeffs = fb.wavedec2_pallas_mode(x, wavelet, level, mode)
        thr = percentile_abs_pytree(coeffs, float(percentile), pad_zeros=pad)
        rec = fb.waverec2_pallas_mode(coeffs, wavelet, mode, threshold=thr)
    else:
        # valid-size modes: subbands stay TILE-PADDED with exact zeros end
        # to end (no output slices, no count re-pads, no synthesis prep
        # pads); the physical pad zeros trade against the mosaic padding in
        # the rank (pad_zeros may go negative — zeros sort first either way)
        coeffs, tshapes = fb.wavedec2_pallas_mode(x, wavelet, level, mode,
                                                  padded=True)
        true_total = x.shape[0] * (
            tshapes[0][0] * tshapes[0][1]
            + 3 * sum(h * w_ for h, w_ in tshapes[1:]))
        phys = sum(l.size for l in jax.tree_util.tree_leaves(coeffs))
        thr = percentile_abs_pytree(coeffs, float(percentile),
                                    pad_zeros=pad - (phys - true_total))
        # threshold is fused into the synthesis kernels' coefficient loads —
        # thresholded coefficients never round-trip through HBM
        rec = fb.waverec2_pallas_mode(coeffs, wavelet, mode, threshold=thr,
                                      true_shapes=tshapes)
    for ax in (-2, -1):
        if rec.shape[ax] > w.shape[ax]:
            rec = jax.lax.slice_in_dim(rec, 0, w.shape[ax],
                                       axis=ax % rec.ndim)
    return rec.reshape(lead + w.shape[-2:]).astype(w.dtype), thr


def dwt_prune_tensor(w, wavelet: str, level: int, percentile,
                     mode: str = "periodization", axes=(-2, -1),
                     coeff_dtype=None):
    """Prune one weight tensor.  Returns (pruned, threshold_value).

    ``percentile`` in [0, 100] (the reference CLI threshold * 100,
    /root/reference/ResNet/main_pruning.py:186); static, like ``wavelet``,
    ``level``, ``mode``, ``axes`` (rank resolution is host-side for exact
    numpy-percentile parity).

    ``coeff_dtype=jnp.bfloat16`` runs the Pallas filter banks in bf16 (half
    the HBM traffic, native one-pass MXU dots) — a FAST LOSSY mode for big
    spatial tensors; default f32 keeps numpy/pywt parity.
    """
    if w.ndim < 2:
        return th.percentile_threshold(w, percentile)
    lvl = clamped_level([w.shape[axes[0]], w.shape[axes[1]]] if axes != (-2, -1)
                        else w.shape, wavelet, level)
    if lvl > 0 and _pallas_eligible(w.shape, mode, axes, lvl, wavelet):
        return _dwt_prune_tensor_pallas(
            w, wavelet, lvl, percentile, mode,
            coeff_dtype=coeff_dtype or jnp.float32)
    coeffs = dj.wavedec2(w, wavelet, lvl, mode, axes=axes)
    arr, slices = dj.coeffs_to_array(coeffs, axes=axes)
    pruned_arr, thr = th.percentile_threshold(arr, percentile)
    rec = dj.waverec2(dj.array_to_coeffs(pruned_arr, slices, axes=axes),
                      wavelet, mode, axes=axes)
    # crop reconstruction overshoot (odd dims) back to the original shape
    for ax in axes:
        ax = ax % w.ndim
        if rec.shape[ax] > w.shape[ax]:
            rec = jax.lax.slice_in_dim(rec, 0, w.shape[ax], axis=ax)
    return rec.astype(w.dtype), thr


def dwt_prune_tensor_batched(w, wavelet: str, level: int, percentile,
                             mode: str = "periodization"):
    """Prune a stack of same-shape tensors (leading axis = tensor index) with
    an INDEPENDENT global percentile per tensor — exactly ``vmap`` of
    ``dwt_prune_tensor`` semantics, but with the percentile's radix descent
    batched so a whole group of layers is one fused program instead of G
    sequential ones (the reference loops layers one at a time,
    /root/reference/ResNet/dwt_pruning.py:158)."""
    from ..parallel.quantile import percentile_abs_batched

    g = w.shape[0]
    if w.ndim - 1 < 2:
        # stack of <2-D tensors: direct per-tensor percentile threshold
        arr = w.reshape(g, -1)
    else:
        lvl = clamped_level(w.shape[1:], wavelet, level)
        coeffs = dj.wavedec2(w, wavelet, lvl, mode)
        arr, slices = dj.coeffs_to_array(coeffs)
    thr = percentile_abs_batched(arr, float(percentile))
    tb = thr.reshape((g,) + (1,) * (arr.ndim - 1))
    pruned_arr = jnp.where(jnp.abs(arr) < tb, jnp.zeros((), arr.dtype), arr)
    if w.ndim - 1 < 2:
        return pruned_arr.reshape(w.shape), thr
    rec = dj.waverec2(dj.array_to_coeffs(pruned_arr, slices), wavelet, mode)
    for ax in (-2, -1):
        ax = ax % w.ndim
        if rec.shape[ax] > w.shape[ax]:
            rec = jax.lax.slice_in_dim(rec, 0, w.shape[ax], axis=ax)
    return rec.astype(w.dtype), thr


def _gang_pallas_routed(t, wavelet: str, level: int, mode: str) -> bool:
    """Single source of truth for which tensors the gang sweep routes
    through the fused Pallas kernels — uses the ACTUAL clamped per-tensor
    level so routing and eligibility can never disagree."""
    lvl_t = clamped_level(t.shape, wavelet, level) if t.ndim >= 2 else 0
    return lvl_t > 0 and _pallas_eligible(t.shape, mode, (-2, -1), lvl_t,
                                          wavelet)


def _use_grouped_gang(tensors, wavelet: str, level: int, mode: str) -> bool:
    """Route the whole-checkpoint sweep through the merged lockstep
    percentile descent: all shape groups advance together, one fused count
    (and, sharded, one collective) per descent step
    (parallel/quantile.percentile_abs_stacks).  Any backend: the batched
    descent is bit-identical to the per-tensor path, and on a mesh it is
    what keeps the sharded gang encode's collective count flat in the
    number of layer groups."""
    eligible = [t for t in tensors
                if not _gang_pallas_routed(t, wavelet, level, mode)
                and t.dtype == jnp.float32]
    return len(eligible) >= 2


def _gang_encode_grouped(tensors: tuple, wavelet: str, level: int,
                         mode: str, percentile: float, out: list,
                         zeros: list, idxs_all: list,
                         true_dim0: tuple | None = None):
    """Fused sweep: (1) forward transform per same-shape group (batched),
    (2) ONE merged lockstep radix descent across ALL groups computing every
    tensor's independent global percentile (one fused count — and, sharded,
    one collective — per descent step for the whole checkpoint), (3)
    threshold + inverse transform per group.  Bit-identical to the
    per-tensor path.

    ``true_dim0[i]`` (static, optional): the tensor's REAL axis-0 extent
    when it was zero-padded on its out-channel axis so an awkward shape
    could still shard over a mesh (parallel/gang pad-and-mask fallback).
    The pad rows' coefficients are exact zeros (the transform is linear),
    so they enter the percentile as a per-slice rank shift
    (quantile.percentile_abs_stacks ``pad_zeros``) and the output is
    sliced back — bit-identical to encoding the unpadded tensor."""
    from ..parallel.quantile import percentile_abs_stacks

    groups: dict = {}
    for i in idxs_all:
        t = tensors[i]
        groups.setdefault((t.shape, str(t.dtype)), []).append(i)

    def _true_d0(i):
        td = None if true_dim0 is None else true_dim0[i]
        return tensors[i].shape[0] if td is None else td

    # phase 1: mosaics
    mosaics = {}   # group key -> (arr, slices_or_None, lvl)
    for key, idxs in groups.items():
        shape = key[0]
        stacked = (jnp.stack([tensors[i] for i in idxs])
                   if len(idxs) > 1 else tensors[idxs[0]][None])
        if len(shape) < 2:
            arr, slices, lvl = stacked, None, 0
        else:
            lvl = clamped_level(shape, wavelet, level)
            coeffs = dj.wavedec2(stacked, wavelet, lvl, mode)
            arr, slices = dj.coeffs_to_array(coeffs)
        mosaics[key] = (arr, slices, lvl)

    # phase 2: one merged descent — every group's thresholds together,
    # with per-slice rank shifts for pad-and-mask zero rows (the mosaic
    # size scales linearly in the axis-0 extent, so a padded slice holds
    # exactly (d0 - true_d0)/d0 of its mosaic as physical zeros)
    keys = list(groups.keys())
    pads = []
    for k in keys:
        d0 = k[0][0] if len(k[0]) >= 1 else 1
        arr = mosaics[k][0]
        per_slice = arr.size // arr.shape[0]
        pads.append([per_slice // d0 * (d0 - _true_d0(i))
                     for i in groups[k]])
    if not any(any(p) for p in pads):
        pads = None
    thrs = percentile_abs_stacks([mosaics[k][0] for k in keys],
                                 float(percentile), pad_zeros=pads)

    # phase 3: threshold + inverse per group
    for key, tg in zip(keys, thrs):
        idxs = groups[key]
        arr, slices, lvl = mosaics[key]
        g = arr.shape[0]
        tb = tg.reshape((g,) + (1,) * (arr.ndim - 1))
        pruned_arr = jnp.where(jnp.abs(arr) < tb,
                               jnp.zeros((), arr.dtype), arr)
        if slices is None:
            rec = pruned_arr
        else:
            rec = dj.waverec2(dj.array_to_coeffs(pruned_arr, slices),
                              wavelet, mode)
            shape = key[0]
            for ax in (-2, -1):
                axp = ax % rec.ndim
                if rec.shape[axp] > shape[ax]:
                    rec = jax.lax.slice_in_dim(rec, 0, shape[ax], axis=axp)
        for j, i in enumerate(idxs):
            r = rec[j]
            td = _true_d0(i)
            if td != r.shape[0]:  # pad-and-mask: slice the zero rows away
                r = jax.lax.slice_in_dim(r, 0, td, axis=0)
            out[i] = r.astype(tensors[i].dtype)
            zeros[i] = th.exact_zero_count(out[i])


@functools.partial(jax.jit,
                   static_argnames=("wavelet", "level", "mode", "percentile",
                                    "true_dim0"))
def _gang_encode(tensors: tuple, wavelet: str, level: int,
                 mode: str, percentile: float,
                 true_dim0: tuple | None = None):
    """Jitted whole-checkpoint sweep.  All non-Pallas-routed layers share
    one merged lockstep percentile descent (per-layer thresholds stay
    exactly independent); big spatial tensors use the fused filter-bank
    kernels (TPU only).

    ``true_dim0`` (static): per-tensor real axis-0 extents for tensors the
    sharded gang path zero-padded on their out-channel axis (pad-and-mask
    fallback); ``None`` entries mean unpadded.  Padded tensors route
    through the grouped path, which rank-shifts the percentile and slices
    the pad rows back off — bit-identical to the unpadded encode."""
    n = len(tensors)
    out: list = [None] * n
    zeros: list = [None] * n

    def _padded(i):
        return (true_dim0 is not None and true_dim0[i] is not None
                and true_dim0[i] != tensors[i].shape[0])

    use_grouped = (_use_grouped_gang(tensors, wavelet, level, mode)
                   or any(_padded(i) for i in range(n)))
    grouped_idxs = []
    for i, t in enumerate(tensors):
        if (use_grouped
                and not _gang_pallas_routed(t, wavelet, level, mode)
                and t.dtype == jnp.float32):
            grouped_idxs.append(i)
        else:
            if _padded(i):
                raise NotImplementedError(
                    "pad-and-mask sharding is only supported for tensors "
                    "on the grouped (f32, non-Pallas-routed) encode path; "
                    f"tensor {i} shape {tensors[i].shape} "
                    f"dtype {tensors[i].dtype}")
            pruned, _ = dwt_prune_tensor(t, wavelet, level, percentile, mode)
            out[i] = pruned
            zeros[i] = th.exact_zero_count(pruned)
    if grouped_idxs:
        _gang_encode_grouped(tensors, wavelet, level, mode, percentile,
                             out, zeros, grouped_idxs, true_dim0)
    return tuple(out), tuple(zeros)


def wavelet_pruning(params: dict, wavelet: str, level: int, percentile: float,
                    mode: str = "periodization", layer_filter=is_conv_kernel,
                    threshold: float | None = None):
    """Apply selective DWT pruning to every selected tensor of ``params``.

    Returns (new_params, PruneStats).  ``percentile`` in [0, 100];
    ``threshold`` (0..1 CLI value) is recorded in the stats as
    percentile / 100 if not given (/root/reference/ResNet/dwt_pruning.py:147).
    """
    names = tuple(n for n, v in params.items() if layer_filter(n, v))
    tensors = tuple(jnp.asarray(params[n]) for n in names)
    pruned, zeros = _gang_encode(tensors, wavelet, level, mode,
                                 float(percentile))
    stats = PruneStats(
        phase="selective", wavelet=wavelet, level=level,
        threshold=percentile / 100.0 if threshold is None else threshold,
    )
    new_params = dict(params)
    for n, t, z in zip(names, pruned, zeros):
        new_params[n] = t
        total = int(t.size)
        z = int(z)
        stats.layers.append(LayerPruneStats(
            layer_name=n, original_param_count=total,
            non_zero_params=total - z, pruned_count=z,
        ))
    return new_params, stats
