"""On-TPU smoke test: Mosaic-lowered kernel correctness in < 60 s (cached).

CI runs the Pallas kernels in interpreter mode only (one-TPU-client
constraint), so a Mosaic lowering regression would otherwise surface only in
bench numbers.  This script executes every kernel family ON THE CHIP with
correctness asserts vs the XLA engine, tiny shapes, compile-cache friendly.

Run ALONE (one TPU client):  python scripts/tpu_smoke.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def check(name, got, want, tol=1e-4):
    import jax.numpy as jnp

    err = float(jnp.max(jnp.abs(got - jnp.asarray(want, got.dtype))))
    status = "ok" if err < tol else "FAIL"
    print(f"  {name}: max|err| {err:.3e} [{status}]", flush=True)
    assert err < tol, (name, err)


def main():
    t_start = time.time()
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    from wavelettransforms_tpu.ops import dwt_jax as dj
    from wavelettransforms_tpu.ops import threshold as th
    from wavelettransforms_tpu.ops.pallas import filterbank as fb
    from wavelettransforms_tpu.parallel.quantile import (
        percentile_abs_pytree)
    from wavelettransforms_tpu.prune.dwt_prune import _dwt_prune_tensor_pallas

    backend = jax.default_backend()
    print(f"backend: {backend}", flush=True)
    assert backend == "tpu", "smoke test must run on the chip"

    rng = np.random.default_rng(0)
    N = 512
    x = jnp.asarray(rng.standard_normal((1, N, N)).astype(np.float32))
    wavelet = "bior4.4"

    # 1) periodization analysis + synthesis kernels
    print("periodization kernels:", flush=True)
    ll, hl, lh, hh = fb.dwt2_level_pallas(x, wavelet)
    cA, (cH, cV, cD) = dj.dwt2(x, wavelet)
    for name, a, b in (("ll", ll, cA), ("hl", hl, cH), ("lh", lh, cV),
                       ("hh", hh, cD)):
        check(f"analysis {name}", a, b)
    check("roundtrip", fb.idwt2_level_pallas(ll, hl, lh, hh, wavelet), x)

    # 2) valid-size mode kernels (symmetric), multi-level w/ fused threshold
    print("valid-mode kernels (symmetric, L3):", flush=True)
    lvl = 3
    out_k, thr_k = _dwt_prune_tensor_pallas(x[0], wavelet, lvl, 61.8,
                                            "symmetric")
    coeffs = dj.wavedec2(x[0], wavelet, lvl, "symmetric")
    arr, slices = dj.coeffs_to_array(coeffs)
    thr_e, _ = th.percentile_threshold(arr, 61.8)[1], None
    check("percentile(+virtual padding)", thr_k.reshape(()),
          np.asarray(thr_e), tol=1e-5)
    pr, _ = th.percentile_threshold(arr, 61.8)
    rec = dj.waverec2(dj.array_to_coeffs(pr, slices), wavelet, "symmetric")
    check("multilevel symmetric prune", out_k, rec[..., :N, :N], tol=2e-3)

    # 3) bf16 paths (periodization + symmetric single level)
    print("bf16 kernels:", flush=True)
    x16 = x.astype(jnp.bfloat16)
    l2, h2, v2, d2 = fb.dwt2_level_pallas(x16, wavelet)
    check("bf16 periodization ll", l2.astype(jnp.float32), np.asarray(cA),
          tol=0.05)
    s16 = fb.dwt2_level_pallas_mode(x16, wavelet, "symmetric")
    sref = dj.dwt2(x[0:1], wavelet, "symmetric")
    check("bf16 symmetric ll", s16[0].astype(jnp.float32),
          np.asarray(sref[0]), tol=0.05)
    r16 = fb.idwt2_level_pallas_mode(*s16, wavelet, "symmetric")
    check("bf16 symmetric roundtrip", r16[..., :N, :N].astype(jnp.float32),
          np.asarray(x), tol=0.05)

    # 4) Pallas count-below / radix select
    print("select kernel:", flush=True)
    big = jnp.asarray(rng.standard_normal((1024, 1024)).astype(np.float32))
    thr = percentile_abs_pytree([big], 61.8)
    want = np.percentile(np.abs(np.asarray(big)), 61.8)
    check("percentile radix select", thr.reshape(()), np.float32(want),
          tol=1e-5)

    print(f"TPU smoke OK in {time.time()-t_start:.0f}s", flush=True)


if __name__ == "__main__":
    main()
