"""Multi-host initialization and topology helpers.

The reference has no distributed backend (SURVEY.md §2.4); this is the
TPU-native scaling entry point: ``jax.distributed.initialize`` for multi-host
pods, plus helpers that build meshes whose inner axis rides ICI (within a
slice) and outer axis rides DCN (across slices) — the layout that keeps halo
ppermutes and percentile psums on the fast interconnect.

This environment exposes one chip, so multi-host paths are validated through
the virtual-device mesh tests and the driver's dryrun; the code paths here
are the production wiring.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Initialize multi-host JAX.  No-ops on single-process setups; with no
    arguments, relies on TPU pod auto-configuration."""
    if num_processes is not None and num_processes <= 1:
        return
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes, process_id=process_id)
    except (RuntimeError, ValueError):
        # already initialized, or single-process environment
        pass


def pod_mesh(ici_axis: str = "data", dcn_axis: str = "hosts") -> Mesh:
    """Mesh with the host dimension outermost (DCN) and the per-host chips
    innermost (ICI).  Collapses to a flat 1-axis mesh on one host."""
    devices = jax.devices()
    n_hosts = jax.process_count()
    per_host = len(devices) // max(n_hosts, 1)
    if n_hosts <= 1:
        return Mesh(np.array(devices), (ici_axis,))
    arr = np.array(devices).reshape(n_hosts, per_host)
    return Mesh(arr, (dcn_axis, ici_axis))


def local_batch_slice(global_batch: int) -> slice:
    """The slice of a globally-sharded batch this process owns."""
    n = jax.process_count()
    per = global_batch // max(n, 1)
    i = jax.process_index()
    return slice(i * per, (i + 1) * per)
