import time, numpy as np, jax, jax.numpy as jnp
jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
from wavelettransforms_tpu.ops.pallas import filterbank as fb
from wavelettransforms_tpu.ops import dwt_jax as dj

x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 4096, 4096)).astype(np.float32))
nbytes = x.size * 4

t0=time.perf_counter()
ll, hl, lh, hh = fb.dwt2_level_pallas(x, 'bior4.4')
aa, (da, ad, dd) = dj.dwt2(x, 'bior4.4')
e = max(float(jnp.max(jnp.abs(a-b))) for a,b in ((ll,aa),(hl,da),(lh,ad),(hh,dd)))
print(f'TPU analysis err vs f32 XLA path: {e:.3e}  (setup {time.perf_counter()-t0:.0f}s)', flush=True)

def bench_chain(f, x, n1=5, n2=25):
    z = f(x); _ = float(jnp.ravel(jax.tree_util.tree_leaves(z)[0])[0])
    def run(n):
        t0 = time.perf_counter()
        z = x
        for _ in range(n):
            z = f(z)
        _ = float(jnp.ravel(jax.tree_util.tree_leaves(z)[0])[0])
        return time.perf_counter() - t0
    t1, t2 = run(n1), run(n2)
    return (t2 - t1) / (n2 - n1)

for wv in ('bior4.4', 'haar'):
    roundtrip = jax.jit(lambda v, w=wv: fb.idwt2_level_pallas(*fb.dwt2_level_pallas(v, w), w))
    t = bench_chain(roundtrip, x)
    print(f"pallas {wv} L1 roundtrip: {t*1e3:.3f} ms -> {2*2*nbytes/t/1e9:.1f} GB/s", flush=True)

# analysis-only timing via chained self-feeding: feed ll back (2048->...) not same shape;
# instead chain analysis+cheap recombine to keep shape: use concat of subbands
def fwd_keep(v):
    l1, h1, g1, k1 = fb.dwt2_level_pallas(v, 'bior4.4')
    top = jnp.concatenate([l1, g1], axis=-1)
    bot = jnp.concatenate([h1, k1], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)
f = jax.jit(fwd_keep)
t = bench_chain(f, x)
print(f"pallas analysis+pack: {t*1e3:.3f} ms -> {2*nbytes/t/1e9:.1f} GB/s", flush=True)
