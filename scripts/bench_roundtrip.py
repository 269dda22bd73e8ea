"""Exclusive-TPU roundtrip benchmark + correctness check for the Pallas
filter-bank kernels (post double-buffering).  Run ALONE — one TPU client."""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    from wavelettransforms_tpu.ops import dwt_jax as dj
    from wavelettransforms_tpu.ops.pallas import filterbank as fb
    from wavelettransforms_tpu.utils.profiling import chain_bench

    print(f"backend: {jax.default_backend()}", flush=True)
    N = 4096
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, N, N)).astype(np.float32))
    nbytes = x.size * 4
    wavelet = "bior4.4"

    # correctness vs XLA engine on the same chip
    ll, hl, lh, hh = fb.dwt2_level_pallas(x, wavelet)
    cA, (cH, cV, cD) = dj.dwt2(x, wavelet)
    for name, a, b in (("ll", ll, cA), ("hl", hl, cH), ("lh", lh, cV),
                       ("hh", hh, cD)):
        err = float(jnp.max(jnp.abs(a - b)))
        print(f"analysis {name} max|err| vs XLA: {err:.3e}", flush=True)
        assert err < 1e-4, name
    rec = fb.idwt2_level_pallas(ll, hl, lh, hh, wavelet)
    err = float(jnp.max(jnp.abs(rec - x)))
    print(f"roundtrip max|err|: {err:.3e}", flush=True)
    assert err < 1e-4

    for tm in (128, 256, 512):
        def roundtrip(v, tm=tm):
            return fb.idwt2_level_pallas(
                *fb.dwt2_level_pallas(v, wavelet, tm=tm), wavelet)
        t0 = time.time()
        dt = chain_bench(roundtrip, x, n1=5, n2=45)
        gbs = 4 * nbytes / dt / 1e9
        print(f"roundtrip tm={tm}: {dt*1e3:.3f} ms -> {gbs:.1f} GB/s "
              f"(setup {time.time()-t0:.0f}s)", flush=True)

    for tc in (128, 256, 512):
        def roundtrip(v, tc=tc):
            return fb.idwt2_level_pallas(
                *fb.dwt2_level_pallas(v, wavelet), wavelet, tc=tc)
        t0 = time.time()
        dt = chain_bench(roundtrip, x, n1=5, n2=45)
        gbs = 4 * nbytes / dt / 1e9
        print(f"roundtrip tc={tc}: {dt*1e3:.3f} ms -> {gbs:.1f} GB/s "
              f"(setup {time.time()-t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
