"""Mesh-sharded DWT + distributed quantile tests (8 virtual CPU devices)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wavelettransforms_tpu.ops import threshold as th
from wavelettransforms_tpu.parallel.halo import (
    coeff_tree_size, run_sharded_prune, run_sharded_prune_2d)
from wavelettransforms_tpu.parallel.mesh import make_mesh
from wavelettransforms_tpu.parallel.quantile import percentile_abs
from wavelettransforms_tpu.prune import dwt_prune_tensor


@pytest.fixture(scope="module")
def mesh():
    return make_mesh({"data": 8})


QS = (0.0, 10.0, 50.0, 61.8, 99.9, 100.0)


def test_percentile_numpy_parity_f32(rng):
    # includes the big-n regime where numpy's f32 rank quantizes
    for n in (1001, 100003):
        x = rng.standard_normal(n).astype(np.float32)
        for q in QS:
            want = float(np.percentile(np.abs(x), q))
            got_sort = float(th.percentile_threshold_value(jnp.asarray(x), q))
            got_radix = float(jax.jit(
                lambda v, q=q: percentile_abs(v, q))(jnp.asarray(x)))
            assert abs(got_sort - want) <= 2e-7 * max(1.0, abs(want)), (n, q)
            assert got_radix == pytest.approx(want, abs=1e-12), (n, q)


def test_percentile_numpy_parity_f64(rng):
    x = rng.standard_normal(4097)
    for q in QS:
        want = float(np.percentile(np.abs(x), q))
        got = float(th.percentile_threshold_value(jnp.asarray(x), q))
        assert got == pytest.approx(want, rel=1e-12)


def test_radix_percentile_sharded_matches_global(mesh, rng):
    # psum'd radix select over shards == single-array numpy percentile
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    x = rng.standard_normal((8, 4096)).astype(np.float32)
    for q in (37.5, 90.0):
        fn = shard_map(
            lambda v, q=q: percentile_abs(
                v, q, axis_name="data", total_size=x.size),
            mesh=mesh, in_specs=(P("data", None),), out_specs=P())
        got = float(jax.jit(fn)(jnp.asarray(x)))
        want = float(np.percentile(np.abs(x), q))
        assert got == pytest.approx(want, abs=1e-12)


@pytest.mark.parametrize("wavelet,level", [("haar", 2), ("db2", 2),
                                           ("bior4.4", 3)])
def test_sharded_prune_matches_unsharded(mesh, rng, wavelet, level):
    x = rng.standard_normal((2, 256, 256)).astype(np.float32)
    sharded = np.asarray(
        run_sharded_prune(jnp.asarray(x), wavelet, level, 61.8, mesh))
    unsharded, _ = dwt_prune_tensor(jnp.asarray(x), wavelet, level, 61.8)
    unsharded = np.asarray(unsharded)
    # same coefficients -> identical zero patterns; values equal up to the
    # conv-vs-matmul accumulation-order difference at deep levels
    assert np.array_equal(sharded == 0, unsharded == 0) or \
        np.max(np.abs(sharded - unsharded)) < 1e-5
    np.testing.assert_allclose(sharded, unsharded, atol=1e-5)


def test_coeff_tree_size():
    assert coeff_tree_size(8, 8, 0) == 64
    assert coeff_tree_size(8, 8, 1) == 64
    assert coeff_tree_size(8, 8, 3) == 64
    assert coeff_tree_size(6, 6, 1) == 36


def test_sharded_lossless_roundtrip(mesh, rng):
    # percentile 0 -> pure sharded transform+inverse == identity
    x = rng.standard_normal((1, 128, 128)).astype(np.float32)
    out = np.asarray(run_sharded_prune(jnp.asarray(x), "db6", 2, 0.0, mesh))
    np.testing.assert_allclose(out, x, atol=1e-5)


@pytest.mark.parametrize("rows,cols", [(2, 4), (4, 2), (2, 2)])
def test_2d_tiled_prune_matches_unsharded(rng, rows, cols):
    """BASELINE config 4: BOTH spatial axes tiled over a 2-D mesh with
    per-axis ppermute halo rings + two-axis psum percentile == unsharded."""
    mesh2 = make_mesh({"row": rows, "col": cols},
                      devices=jax.devices()[:rows * cols])
    x = rng.standard_normal((256, 256)).astype(np.float32)
    for wavelet, level in (("haar", 2), ("bior4.4", 3)):
        tiled = np.asarray(run_sharded_prune_2d(
            jnp.asarray(x), wavelet, level, 61.8, mesh2))
        unsharded, _ = dwt_prune_tensor(jnp.asarray(x), wavelet, level, 61.8)
        unsharded = np.asarray(unsharded)
        np.testing.assert_allclose(tiled, unsharded, atol=1e-5)
        # both paths compute the bit-identical threshold -> identical masks
        assert np.array_equal(tiled == 0, unsharded == 0)


def test_batch_axis_sharded_prune_matches_unsharded(mesh, rng):
    """shard_axis on a non-spatial (batch) axis: the DWT is fully local but
    the percentile must still reduce globally over the mesh axis (regression:
    this path crashed with IndexError after the 2-D-tiling refactor)."""
    x = rng.standard_normal((8, 64, 64)).astype(np.float32)
    sharded = np.asarray(run_sharded_prune(
        jnp.asarray(x), "db2", 2, 61.8, mesh, shard_axis=0))
    unsharded, _ = dwt_prune_tensor(jnp.asarray(x), "db2", 2, 61.8)
    unsharded = np.asarray(unsharded)
    np.testing.assert_allclose(sharded, unsharded, atol=1e-5)
    assert np.array_equal(sharded == 0, unsharded == 0)


def test_2d_tiled_one_axis_none_matches_1d(mesh, rng):
    """axis_names with a None entry degenerates to the 1-D sharded path."""
    mesh2 = make_mesh({"row": 8}, devices=jax.devices()[:8])
    x = rng.standard_normal((1, 128, 128)).astype(np.float32)
    got = np.asarray(run_sharded_prune_2d(
        jnp.asarray(x), "db2", 2, 50.0, mesh2, axis_names=("row", None)))
    want = np.asarray(run_sharded_prune(jnp.asarray(x), "db2", 2, 50.0, mesh))
    np.testing.assert_array_equal(got, want)


def test_2d_tiled_lossless_roundtrip(rng):
    mesh2 = make_mesh({"row": 2, "col": 4}, devices=jax.devices()[:8])
    x = rng.standard_normal((1, 128, 256)).astype(np.float32)
    out = np.asarray(run_sharded_prune_2d(
        jnp.asarray(x), "db6", 2, 0.0, mesh2))
    np.testing.assert_allclose(out, x, atol=1e-5)


def test_2d_tiled_rejects_odd_local_length():
    mesh2 = make_mesh({"row": 2, "col": 4}, devices=jax.devices()[:8])
    x = jnp.zeros((96, 72), jnp.float32)  # 72 % (4 * 2^2) != 0 on 'col'
    with pytest.raises(ValueError, match="even local length"):
        run_sharded_prune_2d(x, "haar", 2, 50.0, mesh2)


def test_percentile_abs_batched_matches_numpy(rng):
    """Batched same-shape descent == per-slice np.percentile exactly."""
    import jax.numpy as jnp

    from wavelettransforms_tpu.parallel.quantile import (percentile_abs,
                                                         percentile_abs_batched)

    stacked = jnp.asarray(
        rng.standard_normal((5, 33, 4, 4)).astype(np.float32))
    for p in (0.0, 50.0, 61.8, 100.0):
        got = np.asarray(percentile_abs_batched(stacked, p))
        for g in range(stacked.shape[0]):
            want = np.percentile(np.abs(np.asarray(stacked[g])), p)
            assert got[g] == np.float32(want), (p, g)
            single = float(percentile_abs(stacked[g], p))
            assert got[g] == np.float32(single)


# ---------------------------------------------------------------------------
# Sharded SYMMETRIC-mode prune (halo_modes): north-star boundary extension
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("mesh_shape,names,level", [
    ({"row": 2, "col": 4}, ("row", "col"), 2),
    ({"row": 4, "col": 2}, ("row", "col"), 1),
    ({"row": 2, "col": 4}, ("row", None), 3),
    ({"row": 1, "col": 8}, (None, "col"), 1),
])
def test_sharded_symmetric_prune_matches_unsharded(rng, mesh_shape, names,
                                                   level, monkeypatch):
    """Bit-exact threshold + reconstruction vs the unsharded engine prune
    (same valid-mode convs, same accumulation order, same radix select).
    The engine's small-axis dense-matmul shortcut accumulates differently
    (1-ulp), so pin both paths to the conv kernels."""
    from wavelettransforms_tpu.ops import dwt_jax as dj
    from wavelettransforms_tpu.parallel.halo_modes import (
        run_sharded_prune_sym)

    monkeypatch.setattr(dj, "MATMUL_MAX_N", 0)
    mesh = make_mesh(mesh_shape)
    x = rng.standard_normal((128, 128)).astype(np.float32)
    got, thr = run_sharded_prune_sym(x, "bior4.4", level, 61.8, mesh, names)
    want, thr_w = dwt_prune_tensor(jnp.asarray(x), "bior4.4", level, 61.8,
                                   mode="symmetric")
    assert got.shape == want.shape == x.shape
    assert float(thr) == float(thr_w), (float(thr), float(thr_w))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_sharded_symmetric_prune_batched_lead(rng, monkeypatch):
    """Leading batch dims ride along unsharded; mosaic padding zeros and the
    global percentile stay per-whole-tensor (one threshold)."""
    from wavelettransforms_tpu.ops import dwt_jax as dj
    from wavelettransforms_tpu.parallel.halo_modes import (
        run_sharded_prune_sym)

    monkeypatch.setattr(dj, "MATMUL_MAX_N", 0)
    mesh = make_mesh({"row": 2, "col": 4})
    x = rng.standard_normal((3, 64, 128)).astype(np.float32)
    got, thr = run_sharded_prune_sym(x, "db2", 2, 50.0, mesh,
                                     ("row", "col"))
    want, thr_w = dwt_prune_tensor(jnp.asarray(x), "db2", 2, 50.0,
                                   mode="symmetric")
    assert float(thr) == float(thr_w)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_sharded_symmetric_rejects_short_shards():
    from wavelettransforms_tpu.parallel.halo_modes import (
        run_sharded_prune_sym)

    mesh = make_mesh({"row": 2, "col": 4})
    x = jnp.zeros((64, 64), jnp.float32)  # col local 16 -> level-2 len 4 < F-2
    with pytest.raises(ValueError, match="too short"):
        run_sharded_prune_sym(x, "bior4.4", 2, 50.0, mesh, ("row", "col"))


@pytest.mark.parametrize("mode", ["reflect", "zero", "constant", "periodic"])
def test_sharded_valid_mode_prune_matches_unsharded(rng, mode, monkeypatch):
    """Every pywt valid-size boundary mode, sharded == unsharded bit-exact
    (periodic included: its edge extensions ride ring ppermutes)."""
    from wavelettransforms_tpu.ops import dwt_jax as dj
    from wavelettransforms_tpu.parallel.halo_modes import (
        run_sharded_prune_sym)

    monkeypatch.setattr(dj, "MATMUL_MAX_N", 0)
    mesh = make_mesh({"row": 2, "col": 4})
    x = rng.standard_normal((128, 128)).astype(np.float32)
    got, thr = run_sharded_prune_sym(x, "db2", 2, 61.8, mesh,
                                     ("row", "col"), mode=mode)
    want, thr_w = dwt_prune_tensor(jnp.asarray(x), "db2", 2, 61.8,
                                   mode=mode)
    assert got.shape == want.shape == x.shape
    assert float(thr) == float(thr_w), (mode, float(thr), float(thr_w))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
