"""Measure the Pallas-vs-XLA routing crossover for the DWT prune.

VERDICT r4 item 7: ``prune.dwt_prune._pallas_eligible`` gated the fused
kernels behind an unvalidated h*w >= 2^20 floor, so mid-size tensors (a
1024x512 fused MLP block — BASELINE config 4's workload class) took the
~22x-slower XLA conv path.  This harness times ``dwt_prune_tensor`` on a
grid of sizes x levels with the routing FORCED each way and prints a
crossover table; the floor in ``_pallas_eligible`` is set from this data.

Usage (on the TPU host):  python scripts/bench_crossover.py
Emits one JSON line per (size, level): {"shape": .., "level": .., both ms}.
"""
from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")  # PYTHONPATH env breaks the axon plugin

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    from wavelettransforms_tpu.prune import dwt_prune as dp
    from wavelettransforms_tpu.utils.profiling import chain_bench

    log(f"backend: {jax.default_backend()}")
    wavelet = "bior4.4"
    mode = "periodization"
    orig = dp._pallas_eligible
    rows = []
    cases = [((256, 256), 2), ((512, 512), 2), ((512, 512), 3),
             ((1024, 512), 3), ((1024, 1024), 3), ((1024, 1024), 4),
             ((2048, 2048), 4), ((4096, 4096), 4)]
    for shape, level in cases:
        x = jnp.asarray(np.random.default_rng(0).standard_normal(
            shape).astype(np.float32))
        row = {"shape": list(shape), "level": level}
        for name, force in (("pallas_ms", True), ("xla_ms", False)):
            dp._pallas_eligible = (
                (lambda *a, **k: True) if force else
                (lambda *a, **k: False))
            if force and not orig(shape, mode, (-2, -1), level, wavelet):
                # kernel halo constraints: check the real gate's shape
                # maths still hold at this size before forcing
                lvl_shapes = shape
                hl_, wl_ = shape
                for _ in range(level):
                    hl_, wl_ = (hl_ + 1) // 2, (wl_ + 1) // 2
                if min(hl_, wl_) < 40:  # 4*F headroom
                    row[name] = None
                    log(f"{shape} L{level}: pallas SKIP (coarsest band "
                        f"{min(hl_, wl_)} < 4F)")
                    continue
            fn = jax.jit(lambda v: dp.dwt_prune_tensor(
                v, wavelet, level, 50.0, mode)[0])
            try:
                t0 = time.time()
                sp: list = []
                dt = chain_bench(fn, x, spread_out=sp)
                row[name] = round(dt * 1e3, 3)
                log(f"{shape} L{level} {name}: {dt*1e3:.3f} ms "
                    f"(spread {sp[-1]*100:.0f}%, setup {time.time()-t0:.0f}s)")
            except Exception as e:
                row[name] = None
                log(f"{shape} L{level} {name}: FAILED {type(e).__name__}: "
                    f"{str(e)[:160]}")
            finally:
                dp._pallas_eligible = orig
        rows.append(row)
        print(json.dumps(row), flush=True)
    log("crossover table complete")


if __name__ == "__main__":
    main()
