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
    """Shard axis 0 (out channels) when it divides the mesh axis; otherwise
    fall back to replication (recorded in ``replicated_out`` so callers can
    see how much of the checkpoint did not actually shard)."""
    n = mesh.shape[axis_name]
    if len(shape) >= 1 and shape[0] % n == 0:
        return NamedSharding(mesh, P(axis_name))
    if replicated_out is not None:
        replicated_out.append(tuple(shape))
    return NamedSharding(mesh, P())


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
    placed = tuple(
        jax.device_put(jnp.asarray(params[n]),
                       _channel_sharding(mesh, params[n].shape, axis_name,
                                         replicated))
        for n in names)
    if replicated:
        rep_params = sum(int(np.prod(s)) for s in replicated)
        total_params = sum(int(np.prod(params[n].shape)) for n in names)
        logger.warning(
            "gang_encode_sharded: %d/%d tensors (%.1f%% of params) have an "
            "out-channel dim not divisible by mesh axis %r (size %d) and "
            "were REPLICATED instead of sharded",
            len(replicated), len(names),
            100.0 * rep_params / max(total_params, 1), axis_name,
            mesh.shape[axis_name])

    pruned, zeros = _gang_encode_jit(placed, wavelet, level, mode,
                                     float(percentile))
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
