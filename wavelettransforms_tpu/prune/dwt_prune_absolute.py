"""Legacy absolute-threshold DWT pruning.

Parity with the reference's first-generation pipeline
(/root/reference/ResNet/dwt_pruning_NoEntropy.py): identical to the
percentile pipeline except
  * a hard absolute threshold |c| < t -> 0 on the coefficient mosaic (:45)
    instead of a per-layer percentile;
  * the sweep prunes EVERY parameter tensor of a selected layer, not just
    the 4-D kernel (:65-91 iterates layer.parameters()).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..ops import dwt_jax as dj
from ..ops import threshold as th
from .api import LayerPruneStats, PruneStats
from .dwt_prune import clamped_level


def dwt_prune_tensor_absolute(w, wavelet: str, level: int, threshold: float,
                              mode: str = "periodization"):
    """Hard-threshold variant of dwt_prune_tensor; ``threshold`` is the
    absolute coefficient magnitude cutoff (static)."""
    if w.ndim < 2:
        return th.hard_threshold(w, threshold)
    lvl = clamped_level(w.shape, wavelet, level)
    coeffs = dj.wavedec2(w, wavelet, lvl, mode)
    arr, slices = dj.coeffs_to_array(coeffs)
    pruned_arr = th.hard_threshold(arr, threshold)
    rec = dj.waverec2(dj.array_to_coeffs(pruned_arr, slices), wavelet, mode)
    rec = rec[..., : w.shape[-2], : w.shape[-1]]
    return rec.astype(w.dtype)


@functools.partial(jax.jit,
                   static_argnames=("wavelet", "level", "mode", "threshold"))
def _gang_encode_absolute(tensors: tuple, wavelet: str, level: int, mode: str,
                          threshold: float):
    out = []
    zeros = []
    for t in tensors:
        pruned = dwt_prune_tensor_absolute(t, wavelet, level, threshold, mode)
        out.append(pruned)
        zeros.append(th.exact_zero_count(pruned))
    return tuple(out), tuple(zeros)


def wavelet_pruning_absolute(params: dict, wavelet: str, level: int,
                             threshold: float, mode: str = "periodization",
                             layer_filter=None):
    """Absolute-threshold sweep over ``params`` (all selected tensors)."""
    if layer_filter is None:
        layer_filter = lambda n, v: getattr(v, "ndim", 0) >= 1
    names = tuple(n for n, v in params.items() if layer_filter(n, v))
    tensors = tuple(jnp.asarray(params[n]) for n in names)
    pruned, zeros = _gang_encode_absolute(tensors, wavelet, level, mode,
                                          float(threshold))
    stats = PruneStats(phase="selective", wavelet=wavelet, level=level,
                       threshold=threshold)
    new_params = dict(params)
    for n, t, z in zip(names, pruned, zeros):
        new_params[n] = t
        total = int(t.size)
        z = int(z)
        stats.layers.append(LayerPruneStats(
            layer_name=n, original_param_count=total,
            non_zero_params=total - z, pruned_count=z))
    return new_params, stats
