"""Benchmark entry point (driver artifact).

Measures the north-star metrics (BASELINE.json): DWT+IDWT filter-bank
throughput per chip and the full ResNet-18 checkpoint encode time, on
whatever backend is available (the real TPU chip under the driver).

Prints exactly ONE JSON line to stdout:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}
Detail lines go to stderr.

vs_baseline: the reference publishes no throughput numbers (BASELINE.md), so
the ratio is measured against this framework's own XLA-conv path on the same
chip — i.e. the speedup the hand-written Pallas kernels deliver over the
compiler baseline for the same operation.

Timing method: chained data-dependent dispatch + host read with two-length
slope (this host's tunnel makes block_until_ready unreliable; see
utils/profiling.chain_bench).
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np


def log(*args):
    print(*args, file=sys.stderr, flush=True)


def retry(fn, attempts: int = 3, settle_s: float = 2.0):
    """This host's TPU tunnel can throw a transient INVALID_ARGUMENT when a
    new program compiles while earlier chained launches are still draining
    (see verify-skill notes).  Settle + retry makes the bench robust."""
    for i in range(attempts):
        try:
            return fn()
        except Exception as e:  # jax.errors.JaxRuntimeError
            if i == attempts - 1 or "INVALID_ARGUMENT" not in str(e):
                raise
            log(f"transient TPU error (attempt {i + 1}), retrying: {e}")
            time.sleep(settle_s)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    from wavelettransforms_tpu.ops import dwt_jax as dj
    from wavelettransforms_tpu.ops.pallas import filterbank as fb
    from wavelettransforms_tpu.utils.profiling import chain_bench

    backend = jax.default_backend()
    on_tpu = backend == "tpu"
    log(f"backend: {backend} ({jax.devices()})")

    # ---------------- filter-bank roundtrip, 4096^2 (config 4 shape) -------
    N = 4096
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (1, N, N)).astype(np.float32))
    nbytes = x.size * 4
    wavelet = "bior4.4"

    t0 = time.time()
    if on_tpu:
        # two separately-jitted (and separately compile-cached) programs,
        # chained at the python level — keeps each Mosaic compile small.
        roundtrip = lambda v: fb.idwt2_level_pallas(
            *fb.dwt2_level_pallas(v, wavelet), wavelet)
    else:
        roundtrip = jax.jit(lambda v: dj.waverec2_packed(
            dj.wavedec2_packed(v[0], wavelet, 1), wavelet, 1, N, N)[None])
    spreads = []
    t_pallas = retry(lambda: chain_bench(roundtrip, x, spread_out=spreads))
    gbs = 2 * 2 * nbytes / t_pallas / 1e9
    log(f"fused roundtrip {wavelet} L1 {N}^2: {t_pallas*1e3:.3f} ms "
        f"-> {gbs:.1f} GB/s (spread {spreads[-1]*100:.1f}%, "
        f"setup {time.time()-t0:.0f}s)")

    # XLA-conv baseline for the same op
    t0 = time.time()
    xla_roundtrip = jax.jit(lambda v: dj.waverec2_packed(
        dj.wavedec2_packed(v[0], wavelet, 1), wavelet, 1, N, N)[None])
    t_xla = retry(lambda: chain_bench(xla_roundtrip, x))
    log(f"XLA-conv roundtrip: {t_xla*1e3:.3f} ms -> "
        f"{2*2*nbytes/t_xla/1e9:.1f} GB/s (setup {time.time()-t0:.0f}s)")

    # ---------------- ResNet-18 checkpoint gang encode ---------------------
    from wavelettransforms_tpu.prune.dwt_prune import _gang_encode

    rng = np.random.default_rng(1)
    shapes = ([(64, 3, 7, 7)] + [(64, 64, 3, 3)] * 4
              + [(128, 64, 3, 3), (128, 128, 3, 3), (128, 64, 1, 1)]
              + [(128, 128, 3, 3)] * 2
              + [(256, 128, 3, 3), (256, 256, 3, 3), (256, 128, 1, 1)]
              + [(256, 256, 3, 3)] * 2
              + [(512, 256, 3, 3), (512, 512, 3, 3), (512, 256, 1, 1)]
              + [(512, 512, 3, 3)] * 2)
    tensors = tuple(jnp.asarray(rng.standard_normal(s).astype(np.float32))
                    for s in shapes)
    n_params = sum(int(np.prod(s)) for s in shapes)
    log(f"ResNet-18 stack: {len(shapes)} conv layers, {n_params} params")

    def encode(ts):
        out, _ = _gang_encode(ts, "bior4.4", 5, "periodization", 50.0)
        return out

    t0 = time.time()
    t_encode = retry(lambda: chain_bench(jax.jit(encode), tensors))
    log(f"gang encode (bior4.4 L5 t=0.5, all 20 layers): "
        f"{t_encode*1e3:.2f} ms (setup {time.time()-t0:.0f}s)")

    # ---------------- gang-encoded baseline pruners ------------------------
    from wavelettransforms_tpu.prune.min_weight import _gang_min
    from wavelettransforms_tpu.prune.random_prune import _gang_random

    counts = tuple(int(np.prod(s) * 0.47808) for s in shapes)  # t=0.5 budget

    t0 = time.time()
    t_min = retry(lambda: chain_bench(
        jax.jit(lambda ts: _gang_min(ts, counts)[0]), tensors))
    log(f"gang min-weight (20 layers, 47.8% budget): {t_min*1e3:.2f} ms "
        f"(setup {time.time()-t0:.0f}s)")

    import jax.random as jrandom

    rkey = jrandom.PRNGKey(0)
    t0 = time.time()
    t_rand = retry(lambda: chain_bench(
        jax.jit(lambda ts: _gang_random(rkey, ts, counts)[0]), tensors))
    log(f"gang random (20 layers, matched counts): {t_rand*1e3:.2f} ms "
        f"(setup {time.time()-t0:.0f}s)")

    detail = {
        "backend": backend,
        "min_weight_gang_ms": round(t_min * 1e3, 2),
        "random_gang_ms": round(t_rand * 1e3, 2),
        "roundtrip_ms_4096x4096_bior44": round(t_pallas * 1e3, 3),
        "xla_conv_roundtrip_ms": round(t_xla * 1e3, 3),
        "resnet18_checkpoint_encode_ms": round(t_encode * 1e3, 2),
        "resnet18_prunable_params": n_params,
        "roundtrip_spread_pct": round(spreads[0] * 100, 1),
    }

    if on_tpu:
        # full prune pipeline: encode -> exact global percentile ->
        # fused-threshold decode (BASELINE config 4 shape)
        from wavelettransforms_tpu.prune.dwt_prune import dwt_prune_tensor

        x2 = x[0]

        @jax.jit
        def prune_big(v):
            out, _ = dwt_prune_tensor(v, wavelet, 4, 50.0)
            return out

        t0 = time.time()
        t_prune = retry(lambda: chain_bench(prune_big, x2))
        log(f"4096^2 L4 full prune: {t_prune*1e3:.2f} ms "
            f"(setup {time.time()-t0:.0f}s)")
        detail["full_prune_ms_4096x4096_L4"] = round(t_prune * 1e3, 2)

        # multi-level symmetric full prune (valid-mode kernels + virtual
        # mosaic-padding percentile) — parity target: the periodization
        # full-prune number above
        @jax.jit
        def prune_big_sym(v):
            out, _ = dwt_prune_tensor(v, wavelet, 4, 50.0, mode="symmetric")
            return out

        t0 = time.time()
        t_prune_sym = retry(lambda: chain_bench(prune_big_sym, x2))
        log(f"4096^2 L4 symmetric full prune: {t_prune_sym*1e3:.2f} ms "
            f"(setup {time.time()-t0:.0f}s)")
        detail["symmetric_full_prune_ms_4096x4096_L4"] = round(
            t_prune_sym * 1e3, 2)

        # symmetric boundary mode (valid-mode kernels)
        def rt_sym(v):
            s = fb.dwt2_level_pallas_mode(v, wavelet, "symmetric")
            return fb.idwt2_level_pallas_mode(
                *s, wavelet, "symmetric")[:, :N, :N]

        t0 = time.time()
        t_sym = retry(lambda: chain_bench(rt_sym, x))
        log(f"symmetric-mode roundtrip: {t_sym*1e3:.2f} ms "
            f"(setup {time.time()-t0:.0f}s)")
        detail["symmetric_roundtrip_ms"] = round(t_sym * 1e3, 3)

        # bfloat16 coefficient path
        x16 = x.astype(jnp.bfloat16)

        def rt16(v):
            return fb.idwt2_level_pallas(
                *fb.dwt2_level_pallas(v, wavelet), wavelet)

        t0 = time.time()
        t_bf16 = retry(lambda: chain_bench(rt16, x16))
        log(f"bf16 roundtrip: {t_bf16*1e3:.2f} ms "
            f"(setup {time.time()-t0:.0f}s)")
        detail["bf16_roundtrip_ms"] = round(t_bf16 * 1e3, 3)

    result = {
        "metric": "dwt_idwt_fused_roundtrip_throughput",
        "value": round(gbs, 1),
        "unit": "GB/s/chip",
        "vs_baseline": round(t_xla / t_pallas, 2),
        "detail": detail,
    }
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
