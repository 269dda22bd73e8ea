"""Scaling-efficiency harness (BASELINE.json: ">=80% linear scaling at 2+ hosts").

Runs the two sharded whole-checkpoint paths at 1/2/4/8 devices and emits one
JSON artifact (SCALING.json at the repo root) with per-device-count wall
times plus the linear-scaling efficiency T1 / (N * T_N):

  * ``tiled_prune``  — 2-D tiled halo-exchange DWT prune of one large square
    tensor (parallel.halo.run_sharded_prune_2d; meshes 1x1 / 1x2 / 2x2 / 2x4)
  * ``gang_encode``  — whole-ResNet-18-checkpoint sharded gang encode
    (parallel.gang.gang_encode_sharded over {'data': N})

Interpretation caveat (recorded in the artifact as ``virtual_mesh``): on
this host the mesh is N VIRTUAL cpu devices time-slicing the same physical
cores, so N devices add no compute.  Under perfect overhead-free sharding
the wall time stays FLAT as N grows (the fixed-size problem is simply split
N ways across the same silicon), so the honest virtual-mesh figure of merit
is ``overhead_vs_single = T_N / T_1 - 1`` — the cost of the halo exchanges,
psum percentile collectives, and GSPMD partitioning that real multi-chip
hardware would also pay.  ``efficiency_linear`` (T1/(N*T_N)) is emitted for
parity with the real-hardware formula but on a virtual mesh it trends to
1/N by construction.  On a real N-chip slice, rerun with JAX_PLATFORMS=tpu
and read ``efficiency_linear`` directly against the >=80% target.

Usage:
    python scripts/bench_scaling.py [--devices 1,2,4,8] [--size 1024]
        [--level 2] [--reps 5] [--out SCALING.json]
"""
from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _force_cpu_mesh(n: int):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + f" --xla_force_host_platform_device_count={n}"
                               ).strip()
    import jax

    jax.config.update("jax_platform_name", "cpu")
    return jax


def _mesh_2d(jax, n: int):
    """Squarest row x col factorization of n for the tiled prune."""
    from wavelettransforms_tpu.parallel.mesh import make_mesh

    r = 1
    for cand in range(int(n ** 0.5), 0, -1):
        if n % cand == 0:
            r = cand
            break
    return make_mesh({"row": r, "col": n // r}, devices=jax.devices()[:n])


def _time(fn, reps: int) -> float:
    import jax

    jax.block_until_ready(fn())  # compile + warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts)


def bench_tiled_prune(jax, n: int, size: int, level: int, reps: int) -> float:
    import numpy as np

    from wavelettransforms_tpu.parallel.halo import run_sharded_prune_2d

    mesh = _mesh_2d(jax, n)
    x = np.random.default_rng(0).standard_normal((size, size)).astype(
        np.float32)
    return _time(
        lambda: run_sharded_prune_2d(x, "bior4.4", level, 50.0, mesh),
        reps)


def bench_tiled_prune_sym(jax, n: int, size: int, level: int,
                          reps: int) -> float:
    import numpy as np

    from wavelettransforms_tpu.parallel.halo_modes import (
        run_sharded_prune_sym)

    mesh = _mesh_2d(jax, n)
    x = np.random.default_rng(0).standard_normal((size, size)).astype(
        np.float32)
    return _time(
        lambda: run_sharded_prune_sym(x, "bior4.4", level, 50.0, mesh)[0],
        reps)


def bench_gang_encode(jax, n: int, reps: int) -> float:
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from wavelettransforms_tpu.parallel.gang import (_channel_sharding,
                                                     _gang_encode_jit)
    from wavelettransforms_tpu.parallel.mesh import make_mesh

    mesh = make_mesh({"data": n}, devices=jax.devices()[:n])
    rng = np.random.default_rng(1)
    shapes = ([(64, 16, 3, 3)] * 4 + [(128, 64, 3, 3)] * 4
              + [(256, 128, 3, 3)] * 4)  # CPU-sized conv stack
    # place once (out-channel sharded), time only the jitted sharded encode —
    # host->device placement is a one-time cost, not encode throughput
    placed = tuple(
        jax.device_put(jnp.asarray(rng.standard_normal(s).astype(np.float32)),
                       _channel_sharding(mesh, s, "data"))
        for s in shapes)
    return _time(
        lambda: _gang_encode_jit(placed, "bior4.4", 5, "periodization",
                                 50.0)[0],
        reps)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", default="1,2,4,8")
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--level", type=int, default=2)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SCALING.json"))
    args = ap.parse_args()
    counts = [int(c) for c in args.devices.split(",")]

    jax = _force_cpu_mesh(max(counts))
    backend = jax.default_backend()
    virtual = backend == "cpu"
    print(f"backend={backend} devices={len(jax.devices())} "
          f"(virtual_mesh={virtual})", file=sys.stderr, flush=True)

    result = {
        "metric": "sharded_scaling",
        "backend": backend,
        "virtual_mesh": virtual,
        "note": ("virtual cpu mesh: N devices time-slice the same cores; "
                 "read overhead_vs_single (flat wall time = overhead-free "
                 "sharding); efficiency_linear is the real-hardware formula"
                 if virtual else
                 "real multi-chip mesh: efficiency_linear vs the >=80% "
                 "target"),
        "workloads": {},
    }
    for name, fn in (("tiled_prune",
                      lambda n: bench_tiled_prune(jax, n, args.size,
                                                  args.level, args.reps)),
                     ("tiled_prune_sym",
                      lambda n: bench_tiled_prune_sym(jax, n, args.size,
                                                      args.level, args.reps)),
                     ("gang_encode",
                      lambda n: bench_gang_encode(jax, n, args.reps))):
        rows = []
        t1 = None
        # TWO alternating passes over the device counts, keeping the
        # per-count minimum: host-level drift between the T_1 and T_N
        # measurements otherwise biases overhead_vs_single by +-15%
        # (measured run-to-run on this 2-core host)
        best = {}
        for _pass in range(2):
            for n in counts:
                t = fn(n)
                best[n] = min(best.get(n, t), t)
        for n in counts:
            t = best[n]
            if n == 1:
                t1 = t
            rows.append({
                "devices": n,
                "wall_ms": round(t * 1e3, 2),
                "efficiency_linear": (round(t1 / (n * t), 3)
                                      if t1 else None),
                "overhead_vs_single": (round(t / t1 - 1.0, 3)
                                       if t1 else None),
            })
            print(f"{name} N={n}: {t*1e3:.2f} ms", file=sys.stderr,
                  flush=True)
        result["workloads"][name] = rows

    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
