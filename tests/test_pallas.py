"""Pallas filter-bank kernel tests (interpreter mode — CPU backend).

Real-TPU compilation/perf is exercised by bench.py; these verify the kernel
math matches the JAX engine exactly (same subband conventions, all halo
paths including odd halos and multi-level recursion).
"""
import jax.numpy as jnp
import numpy as np
import pytest

from wavelettransforms_tpu.ops import dwt_jax as dj
from wavelettransforms_tpu.ops.pallas import filterbank as fb

WAVELETS = ["haar", "db2", "db6", "bior4.4", "rbio2.2", "coif1"]


@pytest.mark.parametrize("wavelet", WAVELETS)
def test_analysis_matches_engine(wavelet, rng):
    x = jnp.asarray(rng.standard_normal((2, 128, 256)).astype(np.float32))
    ll, hl, lh, hh = fb.dwt2_level_pallas(x, wavelet, interpret=True)
    aa, (da, ad, dd) = dj.dwt2(x, wavelet)
    for got, want in ((ll, aa), (hl, da), (lh, ad), (hh, dd)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=3e-6)


@pytest.mark.parametrize("wavelet", WAVELETS)
def test_roundtrip(wavelet, rng):
    x = jnp.asarray(rng.standard_normal((1, 128, 128)).astype(np.float32))
    subbands = fb.dwt2_level_pallas(x, wavelet, interpret=True)
    rec = fb.idwt2_level_pallas(*subbands, wavelet, interpret=True)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(x), atol=3e-6)


def test_multilevel(rng):
    x = jnp.asarray(rng.standard_normal((1, 256, 256)).astype(np.float32))
    coeffs = fb.wavedec2_pallas(x, "bior4.4", 3, interpret=True)
    assert coeffs[0].shape == (1, 32, 32)
    rec = fb.waverec2_pallas(coeffs, "bior4.4", interpret=True)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(x), atol=5e-6)


def test_multirow_grid(rng):
    # force multiple bands per image (tm < H) to exercise halo DMAs
    x = jnp.asarray(rng.standard_normal((1, 512, 128)).astype(np.float32))
    ll, hl, lh, hh = fb.dwt2_level_pallas(x, "db6", tm=128, interpret=True)
    aa, (da, ad, dd) = dj.dwt2(x, "db6")
    np.testing.assert_allclose(np.asarray(ll), np.asarray(aa), atol=3e-6)
    np.testing.assert_allclose(np.asarray(hh), np.asarray(dd), atol=3e-6)


def test_synthesis_fallback_small_width(rng):
    # WC=32 not divisible by 64 -> transpose fallback path in the synthesis
    x = jnp.asarray(rng.standard_normal((1, 64, 64)).astype(np.float32))
    subs = fb.dwt2_level_pallas(x, "db2", interpret=True)
    rec = fb.idwt2_level_pallas(*subs, "db2", interpret=True)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(x), atol=3e-6)


def test_idwt_rows_axis_kernel(rng):
    # the single-axis synthesis kernel used by tests/tools
    cA = jnp.asarray(rng.standard_normal((1, 64, 128)).astype(np.float32))
    cD = jnp.asarray(rng.standard_normal((1, 64, 128)).astype(np.float32))
    out = fb.idwt_rows_pallas(cA, cD, "db4", interpret=True)
    want = dj.idwt(cA, cD, "db4", axis=1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=3e-6)


@pytest.mark.parametrize("wavelet", ["haar", "bior4.4"])
def test_fused_threshold_synthesis(wavelet, rng):
    """threshold= in the synthesis kernel == thresholding coeffs beforehand."""
    from wavelettransforms_tpu.ops import threshold as th

    x = jnp.asarray(rng.standard_normal((2, 64, 128)).astype(np.float32))
    coeffs = fb.wavedec2_pallas(x, wavelet, 2, interpret=True)
    thr = jnp.float32(0.7)
    import jax

    pre = jax.tree_util.tree_map(lambda c: th.hard_threshold(c, thr), coeffs)
    want = fb.waverec2_pallas(pre, wavelet, interpret=True)
    got = fb.waverec2_pallas(coeffs, wavelet, interpret=True, threshold=thr)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0, atol=1e-6)


def test_fused_threshold_single_level_ll_flag(rng):
    x = jnp.asarray(rng.standard_normal((1, 64, 64)).astype(np.float32))
    ll, hl, lh, hh = fb.dwt2_level_pallas(x, "db2", interpret=True)
    thr = jnp.float32(0.5)
    from wavelettransforms_tpu.ops import threshold as th

    # threshold_ll=False: LL untouched
    got = fb.idwt2_level_pallas(ll, hl, lh, hh, "db2", interpret=True,
                                threshold=thr)
    want = fb.idwt2_level_pallas(
        ll, th.hard_threshold(hl, thr), th.hard_threshold(lh, thr),
        th.hard_threshold(hh, thr), "db2", interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)
    # threshold_ll=True: LL thresholded too
    got2 = fb.idwt2_level_pallas(ll, hl, lh, hh, "db2", interpret=True,
                                 threshold=thr, threshold_ll=True)
    want2 = fb.idwt2_level_pallas(
        th.hard_threshold(ll, thr), th.hard_threshold(hl, thr),
        th.hard_threshold(lh, thr), th.hard_threshold(hh, thr),
        "db2", interpret=True)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want2), atol=1e-6)


def test_pallas_count_below_and_select(rng):
    """Multi-candidate count kernel == numpy counts; descent == numpy kth."""
    from wavelettransforms_tpu.ops.pallas import select as sel
    from wavelettransforms_tpu.parallel import quantile as q

    leaves = [
        jnp.asarray(rng.standard_normal((700,)).astype(np.float32)),
        jnp.asarray(rng.standard_normal((64, 33)).astype(np.float32)),
        # wide 2-D leaf with odd lanes/rows: exercises the natural-view
        # sentinel-padding path (no flat relayout)
        jnp.asarray(rng.standard_normal((3, 13, 261)).astype(np.float32)),
    ]
    bits = [q._bits_of_abs(l) for l in leaves]
    allbits = np.concatenate([np.asarray(b).ravel() for b in bits])
    cands = jnp.asarray(
        np.quantile(allbits.astype(np.float64), [0.1, 0.5, 0.9]).astype(
            np.uint32))
    got = np.asarray(sel.count_below(bits, cands, interpret=True))
    want = np.array([(allbits < c).sum() for c in np.asarray(cands)],
                    np.int32)
    np.testing.assert_array_equal(got, want)

    for k in (0, 100, len(allbits) - 1):
        t = np.asarray(q._kth_smallest_bits_pallas(
            bits, (k, min(k + 1, len(allbits) - 1)), interpret=True))
        s = np.sort(allbits)
        assert t[0] == s[k] and t[1] == s[min(k + 1, len(allbits) - 1)]


def test_grouped_percentile_matches_numpy(rng):
    """percentile_abs_grouped == per-array np.percentile, incl. lerp cases."""
    from wavelettransforms_tpu.parallel import quantile as q

    arrs = [
        jnp.asarray(rng.standard_normal((64, 64, 3, 3)).astype(np.float32)),
        jnp.asarray(rng.standard_normal((1000,)).astype(np.float32)),
        jnp.asarray(rng.standard_normal((17, 333)).astype(np.float32)),
    ]
    ps = [50.0, 61.8, 0.0]
    got = np.asarray(q.percentile_abs_grouped(arrs, ps, interpret=True))
    for i, (a, p) in enumerate(zip(arrs, ps)):
        want = np.percentile(np.abs(np.asarray(a)), p)
        assert got[i] == np.float32(want), (i, got[i], want)


def test_bfloat16_roundtrip(rng):
    """bf16 coefficient path: analysis/synthesis accept bf16 in/out
    (f32 compute); result within bf16 tolerance of the f32 path."""
    x32 = rng.standard_normal((1, 64, 128)).astype(np.float32)
    x16 = jnp.asarray(x32, jnp.bfloat16)
    subs16 = fb.dwt2_level_pallas(x16, "bior4.4", interpret=True)
    subs32 = fb.dwt2_level_pallas(jnp.asarray(x32), "bior4.4",
                                  interpret=True)
    for a, b in zip(subs16, subs32):
        assert a.dtype == jnp.bfloat16
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b), rtol=0, atol=0.05)
    rec = fb.idwt2_level_pallas(*subs16, "bior4.4", interpret=True)
    assert rec.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(rec, np.float32), x32,
                               rtol=0, atol=0.08)
    # fused threshold works on bf16 coefficients too
    rec_t = fb.idwt2_level_pallas(*subs16, "bior4.4", interpret=True,
                                  threshold=jnp.float32(10.0),
                                  threshold_ll=True)
    np.testing.assert_allclose(np.asarray(rec_t, np.float32), 0.0, atol=1e-6)


@pytest.mark.parametrize("mode", ["symmetric", "reflect", "zero",
                                  "periodic", "constant"])
def test_mode_analysis_matches_engine(mode, rng):
    """Valid-mode kernel (jnp.pad extension) == XLA engine for every
    non-periodization boundary mode, odd and even sizes."""
    for shape in ((2, 64, 128), (1, 37, 67)):
        x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
        got = fb.dwt2_level_pallas_mode(x, "db3", mode, interpret=True)
        cA, (cH, cV, cD) = dj.dwt2(x, "db3", mode)
        for name, a, b in zip("ll hl lh hh".split(), got,
                              (cA, cH, cV, cD)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=0, atol=2e-5,
                err_msg=f"{mode} {shape} {name}")


def test_mode_analysis_bior_symmetric(rng):
    x = jnp.asarray(rng.standard_normal((1, 96, 192)).astype(np.float32))
    got = fb.dwt2_level_pallas_mode(x, "bior4.4", "symmetric",
                                    interpret=True)
    cA, (cH, cV, cD) = dj.dwt2(x, "bior4.4", "symmetric")
    for a, b in zip(got, (cA, cH, cV, cD)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=2e-5)


@pytest.mark.parametrize("mode", ["symmetric", "zero", "reflect"])
def test_mode_synthesis_matches_engine(mode, rng):
    """Valid-mode synthesis kernel == XLA engine idwt2 (and roundtrip
    reconstructs the signal) for non-periodization modes."""
    for shape, wav in (((2, 64, 128), "db3"), ((1, 96, 192), "bior4.4")):
        x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
        ll, hl, lh, hh = fb.dwt2_level_pallas_mode(x, wav, mode,
                                                   interpret=True)
        got = fb.idwt2_level_pallas_mode(ll, hl, lh, hh, wav, mode,
                                         interpret=True)
        want = dj.idwt2((ll, (hl, lh, hh)), wav, mode)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=0, atol=2e-5,
                                   err_msg=f"{mode} {wav}")
        # valid-size inverse reconstructs the interior exactly (pywt crops
        # the waverec output back to the original length)
        H, W = shape[1], shape[2]
        np.testing.assert_allclose(np.asarray(got)[:, :H, :W],
                                   np.asarray(x), rtol=0, atol=2e-5)


def test_mode_synthesis_fused_threshold(rng):
    x = jnp.asarray(rng.standard_normal((1, 64, 128)).astype(np.float32))
    ll, hl, lh, hh = fb.dwt2_level_pallas_mode(x, "db2", "symmetric",
                                               interpret=True)
    thr = jnp.float32(0.8)
    from wavelettransforms_tpu.ops import threshold as th

    got = fb.idwt2_level_pallas_mode(ll, hl, lh, hh, "db2", "symmetric",
                                     interpret=True, threshold=thr,
                                     threshold_ll=True)
    want = fb.idwt2_level_pallas_mode(
        th.hard_threshold(ll, thr), th.hard_threshold(hl, thr),
        th.hard_threshold(lh, thr), th.hard_threshold(hh, thr),
        "db2", "symmetric", interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_bf16x3_mxu_error_bound():
    """The default MXU strategy (manual bf16x3 hi/lo-split dots,
    filterbank._MXU_BF16X3) stays within ~1e-4 of the exact f32 engine.

    Subprocess: the strategy is frozen at filterbank import and conftest pins
    'highest' so the exact-parity tests above stay exact; this runs the
    default fast path in a fresh interpreter.
    """
    import os
    import subprocess
    import sys

    code = (
        "import numpy as np, jax, jax.numpy as jnp\n"
        "jax.config.update('jax_platform_name', 'cpu')\n"
        "from wavelettransforms_tpu.ops.pallas import filterbank as fb\n"
        "from wavelettransforms_tpu.ops import dwt_jax as dj\n"
        "assert fb._MXU_BF16X3, 'default strategy expected'\n"
        "x = jnp.asarray(np.random.default_rng(0).standard_normal(\n"
        "    (1, 256, 256)).astype(np.float32))\n"
        "ll, hl, lh, hh = fb.dwt2_level_pallas(x, 'bior4.4', interpret=True)\n"
        "cA, (cH, cV, cD) = dj.dwt2(x, 'bior4.4')\n"
        "errs = [float(jnp.max(jnp.abs(a - b)))\n"
        "        for a, b in ((ll, cA), (hl, cH), (lh, cV), (hh, cD))]\n"
        "rec = fb.idwt2_level_pallas(ll, hl, lh, hh, 'bior4.4',\n"
        "                            interpret=True)\n"
        "err_rt = float(jnp.max(jnp.abs(rec - x)))\n"
        "assert max(errs) < 2e-4 and err_rt < 2e-4, (errs, err_rt)\n"
        "print('bf16x3 errs', max(errs), err_rt)\n"
    )
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("WTT_MXU_PRECISION", None)
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run([sys.executable, "-c", code], cwd=root, env=env,
                          capture_output=True, text=True, timeout=300)
    assert proc.returncode == 0, (proc.stdout, proc.stderr[-2000:])


def test_bf16x3_valid_mode_and_prune_threshold():
    """Default bf16x3 strategy, the paths the single-wavelet test above does
    not reach: the tile-padded valid-mode pipeline (analysis + fused-
    threshold synthesis) and an END-TO-END prune — threshold selection must
    match the exact-f32 engine to ~1e-4 relative and the reconstruction must
    differ only at rare budget-boundary coefficient flips (same acceptance
    as scripts/tpu_smoke.py uses on the chip).

    Subprocess: conftest pins WTT_MXU_PRECISION=highest for exact-parity
    tests; this runs the shipped default in a fresh interpreter.
    """
    import os
    import subprocess
    import sys

    code = (
        "import numpy as np, jax, jax.numpy as jnp\n"
        "jax.config.update('jax_platform_name', 'cpu')\n"
        "from wavelettransforms_tpu.ops.pallas import filterbank as fb\n"
        "from wavelettransforms_tpu.ops import dwt_jax as dj\n"
        "from wavelettransforms_tpu.ops import threshold as th\n"
        "assert fb._MXU_BF16X3, 'default strategy expected'\n"
        "fb.INTERPRET = True  # force interpreter inside the prune path\n"
        "from wavelettransforms_tpu.prune.dwt_prune import (\n"
        "    _dwt_prune_tensor_pallas)\n"
        "x = jnp.asarray(np.random.default_rng(1).standard_normal(\n"
        "    (96, 192)).astype(np.float32))\n"
        "out, thr = _dwt_prune_tensor_pallas(x, 'bior4.4', 2, 61.8,\n"
        "                                    'symmetric')\n"
        "coeffs = dj.wavedec2(x, 'bior4.4', 2, 'symmetric')\n"
        "arr, slices = dj.coeffs_to_array(coeffs)\n"
        "pr, thr_e = th.percentile_threshold(arr, 61.8)\n"
        "rec = dj.waverec2(dj.array_to_coeffs(pr, slices), 'bior4.4',\n"
        "                  'symmetric')\n"
        "dthr = abs(float(thr) - float(thr_e))\n"
        "assert dthr < 1e-4 * max(1.0, abs(float(thr_e))), \\\n"
        "    (float(thr), float(thr_e))\n"
        "diff = np.abs(np.asarray(out) - np.asarray(rec)[:96, :192])\n"
        "flip = float((diff > 1e-3).mean())\n"
        "bulk = float(np.quantile(diff, 0.999))\n"
        "assert flip < 5e-3 and bulk < 2e-3, (flip, bulk)\n"
        "print('bf16x3 valid-mode prune ok', dthr, flip, bulk)\n"
    )
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("WTT_MXU_PRECISION", None)
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run([sys.executable, "-c", code], cwd=root, env=env,
                          capture_output=True, text=True, timeout=300)
    assert proc.returncode == 0, (proc.stdout, proc.stderr[-2000:])


@pytest.mark.parametrize("wav,lvl,mode", [
    ("db2", 3, "symmetric"), ("bior4.4", 2, "reflect"), ("haar", 2, "zero")])
def test_padded_mode_pipeline_matches_unpadded(wav, lvl, mode, rng):
    """padded=True analysis emits tile-padded subbands whose true region is
    BIT-EQUAL to the unpadded kernels and whose pad region is EXACT zeros;
    the padded synthesis chain (true_shapes) reproduces the unpadded
    reconstruction bit-exactly on its extent."""
    x = jnp.asarray(rng.standard_normal((2, 40, 48)).astype(np.float32))
    coeffs, shapes = fb.wavedec2_pallas_mode(x, wav, lvl, mode,
                                             interpret=True, padded=True)
    plain = fb.wavedec2_pallas_mode(x, wav, lvl, mode, interpret=True)

    def chk(p, u, sh):
        h, w = sh
        p = np.asarray(p)
        np.testing.assert_array_equal(p[:, :h, :w], np.asarray(u))
        mask = np.ones(p.shape, bool)
        mask[:, :h, :w] = False
        assert (p[mask] == 0).all(), "pad region must be exact zeros"

    chk(coeffs[0], plain[0], shapes[0])
    for pd, ud, sh in zip(coeffs[1:], plain[1:], shapes[1:]):
        for p, u in zip(pd, ud):
            chk(p, u, sh)

    rec_p = fb.waverec2_pallas_mode(coeffs, wav, mode, interpret=True,
                                    true_shapes=shapes)
    rec_u = fb.waverec2_pallas_mode(plain, wav, mode, interpret=True)
    np.testing.assert_array_equal(
        np.asarray(rec_p)[:, :rec_u.shape[1], :rec_u.shape[2]],
        np.asarray(rec_u))


def test_ragged_periodization_analysis_matches_engine(rng):
    """Ragged (odd / non-128-aligned) PERIODIZATION shapes route through the
    circular-extension valid kernels and must equal the engine exactly
    (pywt ceil-half sizes, odd dims edge-repeated)."""
    for shape in ((1, 37, 67), (2, 48, 96), (1, 41, 128)):
        for wav in ("haar", "db2", "bior4.4"):
            x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
            got = fb.dwt2_level_pallas_mode(x, wav, "periodization",
                                            interpret=True)
            cA, (cH, cV, cD) = dj.dwt2(x, wav, "periodization")
            for name, a, b in zip("ll hl lh hh".split(), got,
                                  (cA, cH, cV, cD)):
                assert a.shape == b.shape, (shape, wav, name)
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), rtol=0, atol=3e-5,
                    err_msg=f"per-ragged {shape} {wav} {name}")


def test_ragged_periodization_synthesis_roundtrip(rng):
    """Wrap-padded valid synthesis == engine idwt2 for ragged periodization
    subbands; roundtrip recovers the signal (even dims exactly; odd dims
    after the standard crop)."""
    for shape, wav in (((1, 37, 67), "db2"), ((2, 48, 96), "bior4.4"),
                       ((1, 64, 64), "haar")):
        x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
        ll, hl, lh, hh = fb.dwt2_level_pallas_mode(x, wav, "periodization",
                                                   interpret=True)
        got = fb.idwt2_level_pallas_mode(ll, hl, lh, hh, wav,
                                         "periodization", interpret=True)
        want = dj.idwt2((ll, (hl, lh, hh)), wav, "periodization")
        assert got.shape == want.shape, (shape, wav)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=0, atol=3e-5, err_msg=f"{shape} {wav}")
        H, W = shape[1], shape[2]
        np.testing.assert_allclose(np.asarray(got)[:, :H, :W],
                                   np.asarray(x), rtol=0, atol=3e-5)


def test_ragged_periodization_multilevel_prune_path(rng):
    """Multi-level wavedec2/waverec2_pallas_mode over a ragged periodization
    cascade (odd level-1, then even) matches the engine, including the
    fused-threshold synthesis the prune pipeline uses."""
    from wavelettransforms_tpu.ops import threshold as th

    x = jnp.asarray(rng.standard_normal((1, 37, 67)).astype(np.float32))
    wav, lvl = "db2", 2
    coeffs = fb.wavedec2_pallas_mode(x, wav, lvl, "periodization",
                                     interpret=True)
    want = dj.wavedec2(x, wav, lvl, "periodization")
    np.testing.assert_allclose(np.asarray(coeffs[0]), np.asarray(want[0]),
                               rtol=0, atol=3e-5)
    for (g1, g2, g3), (w1, w2, w3) in zip(coeffs[1:], want[1:]):
        for a, b in ((g1, w1), (g2, w2), (g3, w3)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=0, atol=3e-5)
    thr = jnp.float32(0.6)
    got = fb.waverec2_pallas_mode(coeffs, wav, "periodization",
                                  interpret=True, threshold=thr)
    import jax

    pre = [jax.tree_util.tree_map(lambda c: th.hard_threshold(c, thr), lv)
           for lv in want]
    pre[0] = th.hard_threshold(want[0], thr)
    rec = dj.waverec2(pre, wav, "periodization")
    np.testing.assert_allclose(np.asarray(got)[:, :rec.shape[1],
                                               :rec.shape[2]],
                               np.asarray(rec), rtol=0, atol=1e-4)


def test_set_mxu_precision_runtime_toggle(rng):
    """set_mxu_precision() re-traces: bf16x3 introduces ~1e-4-scale error vs
    the exact engine, switching back to 'highest' restores exact parity
    (ADVICE r3: the env var alone was a silent no-op after import)."""
    x = jnp.asarray(rng.standard_normal((1, 128, 128)).astype(np.float32))
    want = np.asarray(dj.dwt2(x, "bior4.4")[0])
    assert not fb._MXU_BF16X3  # conftest pins WTT_MXU_PRECISION=highest
    exact = np.max(np.abs(np.asarray(
        fb.dwt2_level_pallas(x, "bior4.4", interpret=True)[0]) - want))
    try:
        fb.set_mxu_precision("bf16x3")
        fast = np.max(np.abs(np.asarray(
            fb.dwt2_level_pallas(x, "bior4.4", interpret=True)[0]) - want))
    finally:
        fb.set_mxu_precision("highest")
    back = np.max(np.abs(np.asarray(
        fb.dwt2_level_pallas(x, "bior4.4", interpret=True)[0]) - want))
    assert exact < 5e-6 and back < 5e-6, (exact, back)
    assert 1e-6 < fast < 5e-4, fast  # bf16x3 visibly lossier, still bounded
    with pytest.raises(ValueError):
        fb.set_mxu_precision("fp8")


def test_set_mxu_precision_invalidates_gang_encode():
    """The toggle must also clear the whole-checkpoint prune entry's jit
    cache, or wavelet_pruning silently keeps the old precision (the exact
    silent-no-op failure mode the API exists to fix)."""
    from wavelettransforms_tpu.prune import dwt_prune

    n0 = dwt_prune._gang_encode._cache_size()
    fb.set_mxu_precision("highest")
    assert dwt_prune._gang_encode._cache_size() == 0 or n0 == 0


def test_ragged_periodization_bf16(rng):
    """bf16 coefficients through the ragged periodization path (wrap
    extension + valid kernels) — within bf16 tolerance of the f32 engine."""
    x32 = rng.standard_normal((1, 41, 67)).astype(np.float32)
    x16 = jnp.asarray(x32, jnp.bfloat16)
    subs = fb.dwt2_level_pallas_mode(x16, "db2", "periodization",
                                     interpret=True)
    want = dj.dwt2(jnp.asarray(x32), "db2", "periodization")
    np.testing.assert_allclose(np.asarray(subs[0], np.float32),
                               np.asarray(want[0]), rtol=0, atol=0.05)
    rec = fb.idwt2_level_pallas_mode(*subs, "db2", "periodization",
                                     interpret=True)
    assert rec.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(rec, np.float32)[:, :41, :67],
                               x32, rtol=0, atol=0.1)


# ---------------------------------------------------------------------------
# Direct edge-extension analysis (no materialized jnp.pad)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("mode", ["symmetric", "reflect", "zero", "constant"])
def test_direct_ext_analysis_matches_engine(mode, rng):
    """The direct edge-extension kernel (strip DMAs + boundary-folded lane
    operators) == XLA engine for every local-extension mode, at shapes that
    actually route to it (W >= 256; odd H exercises the sub-tile row
    remainder region of the DMA plan)."""
    for (H, W) in ((300, 384), (256, 256), (212, 384)):
        x = jnp.asarray(rng.standard_normal((1, H, W)).astype(np.float32))
        assert fb._direct_ext_ok(x, mode, H, W)
        got = fb.dwt2_level_pallas_mode(x, "bior4.4", mode, interpret=True)
        cA, (cH, cV, cD) = dj.dwt2(x, "bior4.4", mode)
        for name, a, b in zip("ll hl lh hh".split(), got, (cA, cH, cV, cD)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=0, atol=2e-5,
                err_msg=f"{mode} {H}x{W} {name}")


@pytest.mark.parametrize("wav", ["haar", "db2", "sym6", "bior4.4"])
def test_direct_ext_filter_lengths(wav, rng):
    """Filter lengths 2/4/12/10: hp_top clamping (F=2 has no top strip) and
    per-length boundary operator folding."""
    x = jnp.asarray(rng.standard_normal((1, 260, 384)).astype(np.float32))
    got = fb.dwt2_level_pallas_mode(x, wav, "symmetric", interpret=True)
    cA, (cH, cV, cD) = dj.dwt2(x, wav, "symmetric")
    for name, a, b in zip("ll hl lh hh".split(), got, (cA, cH, cV, cD)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0,
                                   atol=2e-5, err_msg=f"{wav} {name}")


def test_direct_ext_padded_pipeline_roundtrip(rng):
    """padded=True multi-level pipeline through the direct kernel (level-2
    input is a tile-padded LL with true_shape): exact-zero masking beyond
    the true extent + roundtrip reconstruction."""
    for mode in ("symmetric", "reflect"):
        x = jnp.asarray(rng.standard_normal((1, 384, 384)).astype(np.float32))
        coeffs, shapes = fb.wavedec2_pallas_mode(x, "bior4.4", 2, mode,
                                                 interpret=True, padded=True)
        # pad cells beyond the true extent are exact zeros
        (h1, w1) = shapes[1]
        hl1 = np.asarray(coeffs[1][0])
        assert (hl1[:, h1:, :] == 0).all() and (hl1[:, :, w1:] == 0).all()
        out = fb.waverec2_pallas_mode(coeffs, "bior4.4", mode,
                                      interpret=True, true_shapes=shapes)
        np.testing.assert_allclose(np.asarray(out)[:, :384, :384],
                                   np.asarray(x), rtol=0, atol=2e-5,
                                   err_msg=mode)


def test_out_dtype_override(rng):
    """dwt2_level_pallas(out_dtype=...): bf16 input -> f32 coefficients
    (mixed-precision pipelines) stays within bf16-input tolerance of the
    engine and carries the requested dtype."""
    x32 = rng.standard_normal((1, 64, 128)).astype(np.float32)
    x16 = jnp.asarray(x32, jnp.bfloat16)
    subs = fb.dwt2_level_pallas(x16, "db2", interpret=True,
                                out_dtype=jnp.float32)
    assert all(s.dtype == jnp.float32 for s in subs)
    want = dj.dwt2(jnp.asarray(x32), "db2", "periodization")
    np.testing.assert_allclose(np.asarray(subs[0]), np.asarray(want[0]),
                               rtol=0, atol=0.05)
