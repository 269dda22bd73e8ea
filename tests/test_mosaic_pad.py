"""Analytic mosaic-padding accounting for kernel-path percentiles.

The reference thresholds ONE percentile over the PADDED coefficient mosaic
(/root/reference/ResNet/dwt_pruning.py:67-73): at levels whose subbands
don't tile the mosaic, coeffs_to_array's zero padding participates in the
rank.  The Pallas prune path keeps coefficients as subbands and accounts for
the padding analytically (ops/dwt_jax.mosaic_pad_count +
quantile.percentile_abs_pytree(pad_zeros=...)) — these tests pin that the
virtual accounting is bit-identical to materializing the padded mosaic.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from wavelettransforms_tpu.ops import dwt_jax as dj
from wavelettransforms_tpu.ops import dwt_numpy as _ref
from wavelettransforms_tpu.ops import threshold as th
from wavelettransforms_tpu.parallel import quantile as q


CASES = [
    (37, 41, "haar", 3, "symmetric"),
    (40, 48, "db2", 3, "symmetric"),
    (40, 48, "bior4.4", 2, "zero"),
    (64, 96, "bior4.4", 4, "reflect"),
    (33, 57, "sym4", 2, "periodic"),
    (37, 41, "haar", 3, "periodization"),   # odd dims pad under periodization
    (64, 64, "db2", 3, "periodization"),    # aligned: zero padding
    (50, 62, "coif1", 1, "symmetric"),      # single level: zero padding
]


@pytest.mark.parametrize("h,w,wav,lvl,mode", CASES)
def test_mosaic_pad_count_matches_oracle(rng, h, w, wav, lvl, mode):
    x = rng.standard_normal((h, w))
    coeffs = _ref.wavedec2(x, wav, lvl, mode)
    arr, _ = _ref.coeffs_to_array(coeffs)
    n_coeff = coeffs[0].size + sum(c.size for d in coeffs[1:] for c in d)
    pad = dj.mosaic_pad_count(h, w, wav, lvl, mode)
    assert arr.size - n_coeff == pad
    # padding entries are exactly the zeros of an all-ones coefficient set
    # (boundary extension can create real zero coefficients, so the random
    # mosaic can't be used for this count)
    ones = [np.ones_like(coeffs[0])] + [
        tuple(np.ones_like(c) for c in d) for d in coeffs[1:]]
    arr1, _ = _ref.coeffs_to_array(ones)
    assert int((arr1 == 0).sum()) == pad


def test_level1_and_aligned_periodization_have_no_padding():
    assert dj.mosaic_pad_count(256, 512, "bior4.4", 1, "symmetric") == 0
    assert dj.mosaic_pad_count(4096, 4096, "bior4.4", 4, "periodization") == 0
    assert dj.mosaic_pad_count(1024, 768, "db2", 2, "periodization") == 0


@pytest.mark.parametrize("h,w,wav,lvl,mode", [
    (40, 48, "db2", 3, "symmetric"),
    (64, 96, "bior4.4", 4, "reflect"),
    (37, 41, "haar", 3, "periodization"),
])
def test_percentile_pad_zeros_matches_padded_mosaic(rng, h, w, wav, lvl,
                                                    mode):
    B = 3
    x = jnp.asarray(rng.standard_normal((B, h, w)).astype(np.float32))
    coeffs = dj.wavedec2(x, wav, lvl, mode)
    arr, _ = dj.coeffs_to_array(coeffs)
    leaves = [coeffs[0]] + [c for d in coeffs[1:] for c in d]
    pad = dj.mosaic_pad_count(h, w, wav, lvl, mode) * B
    assert arr.size == sum(l.size for l in leaves) + pad
    n = arr.size
    # include percentiles that land below, across, and above the padding
    # block in the sorted |mosaic| (padding zeros sort first)
    ps = [0.0, 1.0, 50.0, 61.8, 99.5, 100.0,
          (pad - 0.5) / (n - 1) * 100.0,   # boundary-crossing rank
          (pad + 0.5) / (n - 1) * 100.0]
    for p in ps:
        t_mosaic = th.percentile_threshold_value(arr, p)
        t_virtual = q.percentile_abs_pytree(leaves, p, pad_zeros=pad)
        np.testing.assert_array_equal(
            np.asarray(t_mosaic, np.float32), np.asarray(t_virtual),
            err_msg=f"p={p}")


def test_pallas_mode_multilevel_prune_matches_engine(rng, monkeypatch):
    from wavelettransforms_tpu.ops.pallas import filterbank as fb
    from wavelettransforms_tpu.prune import dwt_prune

    monkeypatch.setattr(fb, "INTERPRET", True)
    w = jnp.asarray(rng.standard_normal((1, 40, 48)).astype(np.float32))
    out_k, thr_k = dwt_prune._dwt_prune_tensor_pallas(
        w, "db2", 3, 61.8, "symmetric")
    out_e, thr_e = dwt_prune.dwt_prune_tensor(  # CPU: XLA engine path
        w, "db2", 3, 61.8, "symmetric")
    assert out_k.shape == w.shape
    np.testing.assert_allclose(np.asarray(thr_k), np.asarray(thr_e),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_e),
                               atol=2e-4)


def test_grouped_gang_forced_on_cpu(rng, monkeypatch):
    from wavelettransforms_tpu.prune import dwt_prune

    params = {f"l{i}/kernel":
              jnp.asarray(rng.standard_normal((8, 4, 3, 3)).astype(np.float32))
              for i in range(3)}
    params["odd/kernel"] = jnp.asarray(
        rng.standard_normal((4, 4, 5, 5)).astype(np.float32))
    base, bstats = dwt_prune.wavelet_pruning(dict(params), "bior4.4", 5, 50.0)

    dwt_prune._gang_encode.clear_cache()
    monkeypatch.setattr(dwt_prune, "_use_grouped_gang",
                        lambda *a, **k: True)
    grouped, gstats = dwt_prune.wavelet_pruning(dict(params), "bior4.4", 5,
                                                50.0)
    dwt_prune._gang_encode.clear_cache()
    for k in params:
        np.testing.assert_array_equal(np.asarray(base[k]),
                                      np.asarray(grouped[k]), err_msg=k)
    assert [l.pruned_count for l in bstats.layers] == \
           [l.pruned_count for l in gstats.layers]


def test_percentile_negative_pad_zeros_matches_mosaic(rng):
    """Tile-padded leaves carry PHYSICAL exact-zero pad cells (filterbank
    padded_out); pad_zeros = mosaic_pad - physical_pad (negative here) must
    still reproduce the percentile over the reference's padded mosaic."""
    h, w, wav, lvl, mode = 40, 48, "db2", 3, "symmetric"
    B = 2
    x = jnp.asarray(rng.standard_normal((B, h, w)).astype(np.float32))
    coeffs = dj.wavedec2(x, wav, lvl, mode)
    arr, _ = dj.coeffs_to_array(coeffs)
    leaves = [coeffs[0]] + [c for d in coeffs[1:] for c in d]
    mosaic = dj.mosaic_pad_count(h, w, wav, lvl, mode) * B
    padded = [jnp.pad(l, [(0, 0), (0, 3), (0, 5)]) for l in leaves]
    phys = sum(p.size - l.size for p, l in zip(padded, leaves))
    assert phys > mosaic, "test must exercise the negative branch"
    n = arr.size
    ps = [0.0, 1.0, 50.0, 61.8, 99.5, 100.0,
          (mosaic - 0.5) / (n - 1) * 100.0,
          (mosaic + 0.5) / (n - 1) * 100.0]
    for p in ps:
        t_mosaic = th.percentile_threshold_value(arr, p)
        t_virtual = q.percentile_abs_pytree(padded, p,
                                            pad_zeros=mosaic - phys)
        np.testing.assert_array_equal(
            np.asarray(t_mosaic, np.float32), np.asarray(t_virtual),
            err_msg=f"p={p}")


def test_pallas_ragged_periodization_prune_matches_engine(rng, monkeypatch):
    """Ragged periodization shapes (odd dims, unaligned lanes) through the
    Pallas prune path: threshold and reconstruction must match the engine
    (the shapes the XLA fallback used to own — VERDICT r3 item 4)."""
    from wavelettransforms_tpu.ops.pallas import filterbank as fb
    from wavelettransforms_tpu.prune import dwt_prune

    monkeypatch.setattr(fb, "INTERPRET", True)
    for shape, lvl in (((1, 37, 67), 2), ((1, 41, 48), 1)):
        w = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
        out_k, thr_k = dwt_prune._dwt_prune_tensor_pallas(
            w, "db2", lvl, 61.8, "periodization")
        out_e, thr_e = dwt_prune.dwt_prune_tensor(  # CPU: XLA engine path
            w, "db2", lvl, 61.8, "periodization")
        assert out_k.shape == w.shape
        np.testing.assert_allclose(np.asarray(thr_k), np.asarray(thr_e),
                                   rtol=1e-5, err_msg=str(shape))
        np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_e),
                                   atol=2e-4, err_msg=str(shape))
