import time, numpy as np, jax, jax.numpy as jnp
jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
from wavelettransforms_tpu.ops.pallas import filterbank as fb
from wavelettransforms_tpu.ops import dwt_jax as dj
from wavelettransforms_tpu.utils.profiling import chain_bench

x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 4096, 4096)).astype(np.float32))
nbytes = x.size * 4

for wv in ('bior4.4', 'haar'):
    t0 = time.perf_counter()
    roundtrip = jax.jit(lambda v, w=wv: fb.idwt2_level_pallas(*fb.dwt2_level_pallas(v, w), w))
    t = chain_bench(roundtrip, x)
    print(f"pallas {wv} L1 roundtrip 4096^2: {t*1e3:.3f} ms -> {2*2*nbytes/t/1e9:.1f} GB/s (setup {time.perf_counter()-t0:.0f}s)", flush=True)

# multi-level L3
t0 = time.perf_counter()
rt3 = jax.jit(lambda v: fb.waverec2_pallas(fb.wavedec2_pallas(v, 'bior4.4', 3), 'bior4.4'))
t = chain_bench(rt3, x)
print(f"pallas bior4.4 L3 roundtrip: {t*1e3:.3f} ms -> {2*2*nbytes*1.33/t/1e9:.1f} GB/s eff (setup {time.perf_counter()-t0:.0f}s)", flush=True)

# XLA engine reference point (f32 precision) for the same op
t0 = time.perf_counter()
rtx = jax.jit(lambda v: dj.waverec2_packed(dj.wavedec2_packed(v[0], 'bior4.4', 1), 'bior4.4', 1, 4096, 4096)[None])
t = chain_bench(rtx, x)
print(f"XLA-f32 bior4.4 L1 roundtrip: {t*1e3:.3f} ms -> {2*2*nbytes/t/1e9:.1f} GB/s (setup {time.perf_counter()-t0:.0f}s)", flush=True)

# tiny-batch ResNet-layer path (XLA matmul): chain roundtrip
xb = jnp.asarray(np.random.default_rng(1).standard_normal((512*512, 3, 3)).astype(np.float32))
f = jax.jit(lambda v: dj.waverec2_packed(dj.wavedec2_packed(v, 'haar', 1), 'haar', 1, 3, 3))
t = chain_bench(f, xb)
print(f"tiny-batch haar roundtrip: {t*1e3:.3f} ms -> {2*2*xb.size*4/t/1e9:.1f} GB/s", flush=True)
print("DONE", flush=True)
