"""Device-mesh construction and sharding helpers.

The reference has no distributed backend at all (SURVEY.md §2.4 — its only
parallelism is host threads).  This module is the TPU-native scaling layer:
``jax.sharding.Mesh`` over ICI/DCN, named shardings for data/tensor/spatial
parallel work, and initialization for multi-host runs.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(shape: dict[str, int] | None = None,
              devices=None) -> Mesh:
    """Build a mesh; default = all devices on one 'data' axis.

    shape: ordered {axis_name: size}; total must equal device count
    (use -1 for one axis to infer).
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if not shape:
        shape = {"data": n}
    names = list(shape)
    sizes = [shape[k] for k in names]
    if -1 in sizes:
        i = sizes.index(-1)
        known = int(np.prod([s for s in sizes if s != -1]))
        sizes[i] = n // known
    if int(np.prod(sizes)) != n:
        raise ValueError(f"mesh {dict(zip(names, sizes))} != {n} devices")
    arr = np.array(devices).reshape(sizes)
    return Mesh(arr, names)


def shard(mesh: Mesh, *spec) -> NamedSharding:
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_parallel_spec(mesh: Mesh, batch_axis: str = "data") -> P:
    return P(batch_axis)
