"""On-TPU smoke test: Mosaic-lowered kernel correctness + bench warm-up.

CI runs the Pallas kernels in interpreter mode only (one-TPU-client
constraint), so a Mosaic lowering regression would otherwise surface only in
bench numbers.  Default invocation orchestrates TWO phases, each in its own
subprocess (one TPU client at a time):

  1. ``--correctness``: every kernel family ON THE CHIP with correctness
     asserts vs the XLA engine (plus the 4096^2 bench-shape prune parity
     checks);
  2. every ``bench.py`` section (core/gang/prune/prune_sym/modes) via
     ``bench.py --section X`` — the EXACT jitted programs the driver runs,
     so any program the driver will compile is both validated and warmed
     into the persistent cache here first.  (Round-3 lesson: the driver's
     gang section died on a 302 s cold Mosaic compile that the builder's
     smoke never exercised because it only covered similar-but-not-identical
     programs.)

Per-section wall times are printed — they are dominated by Mosaic compiles
on a cold cache (remote-compile host: minutes) and should be single-digit
seconds warm; a warm-cache regression means the persistent cache
(.jax_cache, git-tracked) is being missed.  After ANY kernel / quantile /
prune-path change: run this, then ``git add -f .jax_cache``.

Run ALONE (one TPU client):  python scripts/tpu_smoke.py [--quick]

Accuracy context: the banded MXU passes default to the manual bf16x3 split
(ops/pallas/filterbank._MXU_BF16X3) — coefficient error vs the f32-HIGHEST
XLA engine is ~5e-5 on N(0,1) data, hence the 1e-4/2e-4 tolerances here
(exact-f32 parity is pinned by the interpret-mode CI tests, which run with
WTT_MXU_PRECISION=highest).
"""
import sys
import time

sys.path.insert(0, "/root/repo")  # PYTHONPATH env breaks the axon plugin

import numpy as np

_t_section = time.time()
_prev_section = None


def check(name, got, want, tol=1e-4):
    import jax.numpy as jnp

    err = float(jnp.max(jnp.abs(got - jnp.asarray(want, got.dtype))))
    status = "ok" if err < tol else "FAIL"
    print(f"  {name}: max|err| {err:.3e} [{status}]", flush=True)
    assert err < tol, (name, err)


def section(name):
    """Start a section; print the previous one's wall time (compile-
    dominated when the cache is cold — the tracked per-kernel metric)."""
    global _t_section, _prev_section
    now = time.time()
    if _prev_section is not None:
        print(f"  [{_prev_section}: {now - _t_section:.0f}s]", flush=True)
    print(f"{name}:", flush=True)
    _t_section = now
    _prev_section = name


def main(quick: bool = False):
    t_start = time.time()
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    from wavelettransforms_tpu.ops import dwt_jax as dj
    from wavelettransforms_tpu.ops import threshold as th
    from wavelettransforms_tpu.ops.pallas import filterbank as fb
    from wavelettransforms_tpu.parallel.quantile import (
        percentile_abs_pytree)
    from wavelettransforms_tpu.prune.dwt_prune import (
        _dwt_prune_tensor_pallas, dwt_prune_tensor)

    backend = jax.default_backend()
    print(f"backend: {backend} (mxu bf16x3: {fb._MXU_BF16X3})", flush=True)
    assert backend == "tpu", "smoke test must run on the chip"

    rng = np.random.default_rng(0)
    N = 512
    x = jnp.asarray(rng.standard_normal((1, N, N)).astype(np.float32))
    wavelet = "bior4.4"

    section("periodization kernels")
    ll, hl, lh, hh = fb.dwt2_level_pallas(x, wavelet)
    cA, (cH, cV, cD) = dj.dwt2(x, wavelet)
    for name, a, b in (("ll", ll, cA), ("hl", hl, cH), ("lh", lh, cV),
                       ("hh", hh, cD)):
        check(f"analysis {name}", a, b)
    check("roundtrip", fb.idwt2_level_pallas(ll, hl, lh, hh, wavelet), x)

    section("valid-mode kernels (symmetric, L3)")
    lvl = 3
    out_k, thr_k = _dwt_prune_tensor_pallas(x[0], wavelet, lvl, 61.8,
                                            "symmetric")
    coeffs = dj.wavedec2(x[0], wavelet, lvl, "symmetric")
    arr, slices = dj.coeffs_to_array(coeffs)
    pr, thr_e = th.percentile_threshold(arr, 61.8)
    check("percentile(+virtual padding)", thr_k.reshape(()),
          np.asarray(thr_e), tol=1e-4)
    rec = dj.waverec2(dj.array_to_coeffs(pr, slices), wavelet, "symmetric")
    check("multilevel symmetric prune", out_k, rec[..., :N, :N], tol=2e-3)

    section("bf16 kernels")
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

    section("select kernel")
    big = jnp.asarray(rng.standard_normal((1024, 1024)).astype(np.float32))
    thr = percentile_abs_pytree([big], 61.8)
    want = np.percentile(np.abs(np.asarray(big)), 61.8)
    check("percentile radix select", thr.reshape(()), np.float32(want),
          tol=1e-5)

    if not quick:
        # 4096^2 bench-shape PARITY checks (the bench sections themselves
        # only time; correctness of the big-shape programs is asserted here)
        section("bench shapes (4096^2)")
        NB = 4096
        xb = jnp.asarray(rng.standard_normal((1, NB, NB)).astype(np.float32))
        rt = jax.jit(lambda v: fb.idwt2_level_pallas(
            *fb.dwt2_level_pallas(v, wavelet), wavelet))
        check("bench roundtrip 4096^2", rt(xb), xb, tol=2e-4)
        for mode, label, xin in (
                ("periodization", "bench prune L4", xb[0]),
                ("symmetric", "bench prune_sym L4", xb[0]),
                # ragged periodization: circular-extension valid-kernel path
                ("periodization", "bench prune ragged L4",
                 xb[0, :-1, :-1])):
            out, thr_b = jax.jit(
                lambda v, m=mode: dwt_prune_tensor(v, wavelet, 4, 50.0,
                                                   mode=m))(xin)
            # XLA-engine oracle: same packed-mosaic percentile + synthesis.
            # Coefficients within ~5e-5 (bf16x3 noise) of the threshold flip
            # between the two paths, each flip perturbing the reconstruction
            # by O(threshold) locally — so assert flips are RARE and the
            # bulk of the field matches, not a max-error bound.
            cs = dj.wavedec2(xin, wavelet, 4, mode)
            ab, sb = dj.coeffs_to_array(cs)
            pb, te = th.percentile_threshold(ab, 50.0)
            rb = dj.waverec2(dj.array_to_coeffs(pb, sb), wavelet, mode)
            check(f"{label} threshold", thr_b.reshape(()), np.asarray(te),
                  tol=1e-4)
            diff = np.abs(np.asarray(out)
                          - np.asarray(rb)[..., :xin.shape[0],
                                           :xin.shape[1]])
            flip_frac = float((diff > 1e-3).mean())
            bulk = float(np.quantile(diff, 0.999))
            # measured flip-frac ~7e-4 at the 50th pct (coefficient density
            # at the median x bf16x3 noise half-width); a flipped coefficient
            # is at the exact budget boundary — keep/drop is arbitrary there
            ok = flip_frac < 2e-3 and bulk < 1e-3
            print(f"  {label} reconstruction: flip-frac {flip_frac:.2e} "
                  f"p99.9|err| {bulk:.2e} [{'ok' if ok else 'FAIL'}]",
                  flush=True)
            assert ok, (label, flip_frac, bulk)

    print(f"TPU smoke OK in {time.time()-t_start:.0f}s", flush=True)


def orchestrate(quick: bool = False):
    """Correctness phase + every bench.py section, one subprocess each
    (one TPU client at a time).  Fails loudly on the first broken phase."""
    import os
    import subprocess

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    from bench import SECTIONS  # single source of truth for section names

    phases = [("correctness", [sys.executable, __file__, "--correctness"]
               + (["--quick"] if quick else []))]
    if not quick:
        phases += [(f"bench:{s}",
                    [sys.executable, os.path.join(repo, "bench.py"),
                     "--section", s])
                   for s in SECTIONS]
    for name, cmd in phases:
        t0 = time.time()
        print(f"=== {name} ===", flush=True)
        rc = subprocess.run(cmd, cwd=repo).returncode
        print(f"=== {name}: rc={rc} in {time.time()-t0:.0f}s ===", flush=True)
        if rc != 0:
            sys.exit(f"phase {name} FAILED (rc={rc})")
    print("ALL PHASES OK — compile cache covers every driver bench program; "
          "remember: git add -f .jax_cache", flush=True)


if __name__ == "__main__":
    if "--correctness" in sys.argv[1:]:
        main(quick="--quick" in sys.argv[1:])
    else:
        orchestrate(quick="--quick" in sys.argv[1:])
