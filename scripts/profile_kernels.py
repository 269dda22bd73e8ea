"""Profile the Pallas filter-bank kernels piecewise on the real TPU.

Breaks the 4096^2 bior4.4 roundtrip into analysis-only / synthesis-only and
sweeps tile sizes, so we know where the time goes before optimizing.
Detail to stderr; grand summary JSON on stdout.
"""
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
    from wavelettransforms_tpu.ops.pallas import filterbank as fb
    from wavelettransforms_tpu.utils.profiling import chain_bench

    log(f"backend: {jax.default_backend()}")
    N = 4096
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (1, N, N)).astype(np.float32))
    nbytes = x.size * 4
    wavelet = "bior4.4"

    results = {}

    # analysis-only at several tile sizes; chain via ll output padded back up
    for tm in (128, 256, 512, 1024):
        def ana(v, tm=tm):
            ll, hl, lh, hh = fb.dwt2_level_pallas(v, wavelet, tm=tm)
            # keep the chain data-dependent & same-shape: tile ll 2x2
            return jnp.tile(ll, (1, 2, 2))
        try:
            t0 = time.time()
            dt = chain_bench(ana, x, n1=3, n2=13)
            # analysis moves in N^2 + out N^2 floats
            log(f"analysis tm={tm}: {dt*1e3:.3f} ms  "
                f"{2*nbytes/dt/1e9:.1f} GB/s  (compile+bench {time.time()-t0:.0f}s)")
            results[f"ana_tm{tm}"] = dt
        except Exception as e:
            log(f"analysis tm={tm}: FAILED {type(e).__name__}: {e}")

    # synthesis-only at several tile sizes
    ll, hl, lh, hh = fb.dwt2_level_pallas(x, wavelet)
    for tc in (64, 128, 256, 512):
        def syn(v, tc=tc):
            y = fb.idwt2_level_pallas(v, hl, lh, hh, wavelet, tc=tc)
            return y[:, :N // 2, :N // 2]
        try:
            t0 = time.time()
            dt = chain_bench(syn, ll, n1=3, n2=13)
            # synthesis reads 4 subbands (N^2 total) + writes N^2
            log(f"synthesis tc={tc}: {dt*1e3:.3f} ms  "
                f"{2*nbytes/dt/1e9:.1f} GB/s  (compile+bench {time.time()-t0:.0f}s)")
            results[f"syn_tc{tc}"] = dt
        except Exception as e:
            log(f"synthesis tc={tc}: FAILED {type(e).__name__}: {e}")

    print(json.dumps({k: round(v * 1e3, 3) for k, v in results.items()}))


if __name__ == "__main__":
    main()
