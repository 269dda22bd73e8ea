"""Pruning-method tests: reference semantics + budget matching."""
import jax.numpy as jnp
import numpy as np
import pytest

from wavelettransforms_tpu.ops import threshold as th
from wavelettransforms_tpu.prune import (
    clamped_level, dwt_prune_tensor, min_weight_pruning, random_pruning,
    wavelet_pruning)


def test_percentile_matches_numpy(rng):
    x = rng.standard_normal(1001)
    for p in (0.0, 10.0, 50.0, 61.8, 90.0, 100.0):
        thr = th.percentile_threshold_value(jnp.asarray(x), p)
        np.testing.assert_allclose(float(thr), np.percentile(np.abs(x), p),
                                   rtol=1e-12)


def test_strict_threshold_semantics():
    # values EQUAL to the threshold survive (np.where(|c| < t, 0, c)).
    x = jnp.asarray([-2.0, -1.0, 0.5, 1.0, 3.0])
    y = th.hard_threshold(x, 1.0)
    np.testing.assert_array_equal(np.asarray(y), [-2.0, -1.0, 0.0, 1.0, 3.0])


def test_clamped_level_per_wavelet():
    assert clamped_level((64, 64, 3, 3), "haar", 5) == 1
    assert clamped_level((64, 64, 3, 3), "bior4.4", 5) == 0
    assert clamped_level((64, 3, 7, 7), "haar", 5) == 2
    assert clamped_level((128, 64, 1, 1), "haar", 5) == 0


def test_level0_prune_is_direct_threshold(rng):
    # bior4.4 on 3x3 kernels: level clamps to 0 -> percentile thresholding of
    # the raw weights (this is why the reference's selective results track
    # min-weight almost exactly).
    w = rng.standard_normal((8, 8, 3, 3))
    pruned, thr = dwt_prune_tensor(jnp.asarray(w), "bior4.4", 5, 50.0)
    expect = np.where(np.abs(w) < np.percentile(np.abs(w), 50.0), 0, w)
    np.testing.assert_allclose(np.asarray(pruned), expect, atol=1e-12)


def test_dwt_prune_t0_lossless(rng):
    # threshold 0 percentile -> nothing pruned -> reconstruction == original
    # (the reference's round-trip control: acc 0.69764 vs 0.69758 baseline).
    w = rng.standard_normal((4, 4, 8, 8))
    pruned, _ = dwt_prune_tensor(jnp.asarray(w), "haar", 3, 0.0)
    np.testing.assert_allclose(np.asarray(pruned), w, atol=1e-9)


def test_dwt_prune_1d_bypass(rng):
    w = rng.standard_normal(100)
    pruned, _ = dwt_prune_tensor(jnp.asarray(w), "haar", 3, 40.0)
    expect = np.where(np.abs(w) < np.percentile(np.abs(w), 40.0), 0, w)
    np.testing.assert_allclose(np.asarray(pruned), expect, atol=1e-12)


@pytest.fixture
def toy_params(rng):
    return {
        "a.convolution.weight": rng.standard_normal((16, 8, 3, 3)),
        "b.convolution.weight": rng.standard_normal((8, 4, 3, 3)),
        "bias": rng.standard_normal(16),  # filtered out (not 4-D)
    }


def test_wavelet_pruning_sweep(toy_params):
    new, stats = wavelet_pruning(toy_params, "haar", 1, 50.0)
    assert [l.layer_name for l in stats.layers] == [
        "a.convolution.weight", "b.convolution.weight"]
    assert stats.total_params == 16 * 8 * 9 + 8 * 4 * 9
    assert 0.0 < stats.prune_fraction < 1.0
    np.testing.assert_array_equal(np.asarray(new["bias"]),
                                  toy_params["bias"])  # untouched
    for l in stats.layers:
        assert l.non_zero_params + l.pruned_count == l.original_param_count


def test_budget_matching(toy_params):
    _, sel = wavelet_pruning(toy_params, "bior4.4", 5, 61.8)
    # min-weight replays the GLOBAL fraction per layer (int truncation)
    new_min, mstats = min_weight_pruning(toy_params, sel)
    frac = sel.prune_fraction
    for l in mstats.layers:
        assert l.pruned_count == int(l.original_param_count * frac)
    # random replays the PER-LAYER counts exactly
    new_rnd, rstats = random_pruning(toy_params, sel, seed=7)
    sel_counts = sel.per_layer_counts()
    for l in rstats.layers:
        assert l.pruned_count == sel_counts[l.layer_name]


def test_random_pruning_is_random(toy_params):
    _, sel = wavelet_pruning(toy_params, "haar", 1, 50.0)
    a, _ = random_pruning(toy_params, sel, seed=1)
    b, _ = random_pruning(toy_params, sel, seed=2)
    k = "a.convolution.weight"
    assert not np.array_equal(np.asarray(a[k]) == 0, np.asarray(b[k]) == 0)


def test_min_weight_zeros_smallest(rng):
    from wavelettransforms_tpu.prune import min_weight_prune_tensor
    w = rng.standard_normal(1000)
    pruned = np.asarray(min_weight_prune_tensor(jnp.asarray(w), 250))
    zeroed = np.flatnonzero(pruned == 0)
    kept = np.flatnonzero(pruned != 0)
    assert len(zeroed) == 250
    assert np.abs(w[zeroed]).max() <= np.abs(w[kept]).min() + 1e-12
