"""Band-size sweep for the core roundtrip kernels (perf experiment).

Measures the analysis/synthesis split of the headline 4096^2 bior4.4
roundtrip and whether larger row bands (fewer, bigger DMAs per grid step)
close part of the 430 -> ~600 GB/s chained-add gap.
"""
import sys
import time

sys.path.insert(0, "/root/repo")  # PYTHONPATH env breaks the axon plugin

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import jax.numpy as jnp
import numpy as np

from wavelettransforms_tpu.ops.pallas import filterbank as fb
from wavelettransforms_tpu.utils.profiling import chain_bench

N = 4096
WAVELET = "bior4.4"
x = jnp.asarray(np.random.default_rng(0).standard_normal(
    (1, N, N)).astype(np.float32))
nbytes = x.size * 4


def bench(label, fn, arg, gb):
    t0 = time.time()
    sp = []
    t = chain_bench(fn, arg, spread_out=sp)
    print(f"{label}: {t*1e3:.3f} ms -> {gb/t/1e9:.1f} GB/s "
          f"(spread {sp[-1]*100:.1f}%, setup {time.time()-t0:.0f}s)",
          flush=True)
    return t


# Baseline split: analysis alone, synthesis alone (chained on own output)
ana = jax.jit(lambda v: fb.dwt2_level_pallas(v, WAVELET)[0])


def ana_chain(v):
    # keep shape (1, N, N): tile the LL back up so the chain has a fixed shape
    ll = fb.dwt2_level_pallas(v, WAVELET)
    return jnp.concatenate([jnp.concatenate([ll[0], ll[1]], axis=2),
                            jnp.concatenate([ll[2], ll[3]], axis=2)], axis=1)


bench("analysis L1 (tm=128, +concat)", jax.jit(ana_chain), x, 2 * nbytes)

subs = fb.dwt2_level_pallas(x, WAVELET)
rt = jax.jit(lambda v: fb.idwt2_level_pallas(
    *fb.dwt2_level_pallas(v, WAVELET), WAVELET))
bench("roundtrip tm=128/tc=128", rt, x, 4 * nbytes)

for tm in (256, 512):
    rt_v = jax.jit(lambda v, tm=tm: fb.idwt2_level_pallas(
        *fb.dwt2_level_pallas(v, WAVELET, tm=tm), WAVELET))
    bench(f"roundtrip tm={tm}/tc=128", rt_v, x, 4 * nbytes)

for tc in (256, 512):
    rt_v = jax.jit(lambda v, tc=tc: fb.idwt2_level_pallas(
        *fb.dwt2_level_pallas(v, WAVELET), WAVELET, tc=tc))
    bench(f"roundtrip tm=128/tc={tc}", rt_v, x, 4 * nbytes)
