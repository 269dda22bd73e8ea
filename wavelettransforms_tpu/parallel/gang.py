"""Multi-device gang encode of whole checkpoints.

The TPU-native analog of "pmap'd sweep over a checkpoint" (BASELINE.json
north star): every conv tensor is sharded along its output-channel axis over
the mesh's data axis and the entire multi-layer encode runs as one jitted
program — XLA/GSPMD inserts the collectives the global per-layer percentile
needs (the threshold semantics stay exactly one-threshold-per-tensor).
"""
from __future__ import annotations

import logging

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..prune.api import LayerPruneStats, PruneStats, is_conv_kernel

logger = logging.getLogger(__name__)


def _channel_sharding(mesh: Mesh, shape, axis_name: str,
                      replicated_out: list | None = None):
    """Shard axis 0 (out channels) when it divides the mesh axis, else
    axis 1 (in channels) when that divides; otherwise fall back to
    replication (recorded in ``replicated_out`` so callers can see how much
    of the checkpoint did not actually shard).  The selective gang path
    additionally pads awkward tensors (``_gang_sharding``) so nothing
    replicates there; this placement helper stays pad-free because budget
    REPLAY methods (min-weight topk) would mis-rank appended zero rows."""
    n = mesh.shape[axis_name]
    if len(shape) >= 1 and shape[0] % n == 0:
        return NamedSharding(mesh, P(axis_name))
    if len(shape) >= 2 and shape[1] % n == 0:
        return NamedSharding(mesh, P(None, axis_name))
    if replicated_out is not None:
        replicated_out.append(tuple(shape))
    return NamedSharding(mesh, P())


def _gang_sharding(mesh: Mesh, shape, axis_name: str):
    """Placement for the selective gang encode: returns ``(sharding, pad0)``
    where ``pad0`` is the number of zero rows to append on axis 0 before
    ``device_put`` (pad-and-mask fallback).  Order of preference:
      1. even out-channel sharding (axis 0 divides the mesh axis);
      2. even in-channel sharding (axis 1 divides);
      3. pad-and-mask: zero-pad axis 0 to the next multiple of the mesh
         axis and shard it — the encode rank-shifts the percentile over the
         pad zeros and slices them back off (prune.dwt_prune._gang_encode
         ``true_dim0``), so results stay bit-exact vs unsharded and NO
         tensor is ever replicated."""
    n = mesh.shape[axis_name]
    if len(shape) == 0:
        return NamedSharding(mesh, P()), 0
    if shape[0] % n == 0:
        return NamedSharding(mesh, P(axis_name)), 0
    if len(shape) >= 2 and shape[1] % n == 0:
        return NamedSharding(mesh, P(None, axis_name)), 0
    return NamedSharding(mesh, P(axis_name)), (-shape[0]) % n


# The sharded sweep runs the SAME jitted whole-checkpoint program as the
# single-chip path (prune.dwt_prune._gang_encode): same-shape layer groups
# share one merged lockstep percentile descent, so under GSPMD the
# checkpoint costs ceil(32/d) combined collectives total instead of one
# descent's worth per group (round-3 SCALING.json: 3.1x overhead at 8
# devices from per-group psum rounds).  Module-level alias keeps the trace
# cache shared across call sites.
from ..prune.dwt_prune import _gang_encode as _gang_encode_jit  # noqa: E402


def gang_encode_sharded(params: dict, wavelet: str, level: int,
                        percentile: float, mesh: Mesh,
                        axis_name: str = "data",
                        mode: str = "periodization",
                        layer_filter=is_conv_kernel):
    """Selective DWT pruning of ``params`` with tensors sharded over the
    mesh.  Identical semantics to prune.wavelet_pruning (same thresholds,
    same stats); returns (new_params sharded, PruneStats)."""
    names = [n for n, v in params.items() if layer_filter(n, v)]
    replicated: list = []
    placed = []
    true_dim0 = []
    n_padded = 0
    for nm in names:
        v = jnp.asarray(params[nm])
        if v.dtype == jnp.float32:
            sh, pad0 = _gang_sharding(mesh, v.shape, axis_name)
        else:
            # non-f32 tensors can't take the pad-and-mask grouped path
            sh, pad0 = _channel_sharding(mesh, v.shape, axis_name,
                                         replicated), 0
        if pad0:
            n_padded += 1
            true_dim0.append(v.shape[0])
            v = jnp.concatenate(
                [v, jnp.zeros((pad0,) + v.shape[1:], v.dtype)])
        else:
            true_dim0.append(None)
        placed.append(jax.device_put(v, sh))
    if n_padded:
        logger.info(
            "gang_encode_sharded: %d/%d tensors had no mesh-divisible "
            "channel axis and were PAD-AND-MASK sharded (zero out-channels "
            "appended, percentile rank-shifted, outputs sliced back) — "
            "0%% of params replicated", n_padded, len(names))
    if replicated:
        rep_params = sum(int(np.prod(s)) for s in replicated)
        total_params = sum(int(np.prod(params[n].shape)) for n in names)
        logger.warning(
            "gang_encode_sharded: %d/%d tensors (%.1f%% of params) have no "
            "mesh-divisible channel axis, are not float32, and were "
            "REPLICATED instead of sharded",
            len(replicated), len(names),
            100.0 * rep_params / max(total_params, 1), axis_name)

    # all-None collapses to None so the trace cache is shared with the
    # unsharded wavelet_pruning path
    td0 = tuple(true_dim0) if n_padded else None
    pruned, zeros = _gang_encode_jit(tuple(placed), wavelet, level, mode,
                                     float(percentile), true_dim0=td0)
    stats = PruneStats(phase="selective", wavelet=wavelet, level=level,
                       threshold=percentile / 100.0)
    new_params = dict(params)
    for n, t, z in zip(names, pruned, zeros):
        new_params[n] = t
        total = int(t.size)
        z = int(z)
        stats.layers.append(LayerPruneStats(
            layer_name=n, original_param_count=total,
            non_zero_params=total - z, pruned_count=z))
    return new_params, stats
