"""JAX engine vs NumPy oracle parity (both matmul and conv paths)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wavelettransforms_tpu.ops import dwt_jax as dj
from wavelettransforms_tpu.ops import dwt_numpy as dn

# n <= MATMUL_MAX_N exercises the matmul path; larger the conv path.
SIZES = [3, 8, 16, 63, 65, 100]


@pytest.mark.parametrize("mode", ["periodization", "symmetric", "zero"])
@pytest.mark.parametrize("name", ["haar", "db4", "bior4.4"])
def test_dwt_1d_parity(name, mode, rng):
    for n in SIZES:
        x = rng.standard_normal((4, n))
        cA0, cD0 = dn.dwt(x, name, mode)
        cA1, cD1 = dj.dwt(jnp.asarray(x), name, mode)
        np.testing.assert_allclose(np.asarray(cA1), cA0, atol=1e-10)
        np.testing.assert_allclose(np.asarray(cD1), cD0, atol=1e-10)
        y0 = dn.idwt(cA0, cD0, name, mode)
        y1 = dj.idwt(jnp.asarray(cA0), jnp.asarray(cD0), name, mode)
        np.testing.assert_allclose(np.asarray(y1), y0, atol=1e-10)


@pytest.mark.parametrize("name", ["db2", "sym4", "coif1", "rbio2.2", "rbio4.4"])
def test_dwt_1d_parity_per_only(name, rng):
    for n in (3, 16, 100):
        x = rng.standard_normal((2, n))
        cA0, cD0 = dn.dwt(x, name, "periodization")
        cA1, cD1 = dj.dwt(jnp.asarray(x), name, "periodization")
        np.testing.assert_allclose(np.asarray(cA1), cA0, atol=1e-10)
        np.testing.assert_allclose(np.asarray(cD1), cD0, atol=1e-10)


@pytest.mark.parametrize("name", ["haar", "bior4.4"])
@pytest.mark.parametrize("shape", [(3, 3), (8, 8), (100, 100)])
@pytest.mark.parametrize("level", [0, 1, 2])
def test_packed_pipeline_parity(name, shape, level, rng):
    x = rng.standard_normal((5,) + shape)
    arr0, _ = dn.coeffs_to_array(dn.wavedec2(x, name, level))
    arr1 = dj.wavedec2_packed(jnp.asarray(x), name, level)
    np.testing.assert_allclose(np.asarray(arr1), arr0, atol=1e-10)
    rec = dj.waverec2_packed(arr1, name, level, shape[0], shape[1])
    np.testing.assert_allclose(np.asarray(rec), x, atol=1e-10)


def test_axis_general(rng):
    # transform over leading axes (flax HWIO conv layout support)
    x = rng.standard_normal((5, 9, 4, 6))
    cA0, cD0 = dn.dwt(x, "db2", "periodization", axis=1)
    cA1, cD1 = dj.dwt(jnp.asarray(x), "db2", "periodization", axis=1)
    np.testing.assert_allclose(np.asarray(cA1), cA0, atol=1e-10)
    a0, d0 = dn.dwt2(x, "haar", axes=(0, 1))
    a1, d1 = dj.dwt2(jnp.asarray(x), "haar", axes=(0, 1))
    np.testing.assert_allclose(np.asarray(a1), a0, atol=1e-10)
    for u, v in zip(d0, d1):
        np.testing.assert_allclose(np.asarray(v), u, atol=1e-10)


def test_jit_static_shapes():
    # wavedec2_packed is jitted with static wavelet/level/mode; two calls with
    # the same signature must not retrace.
    f = dj.wavedec2_packed
    x = jnp.ones((2, 8, 8))
    a = f(x, "db2", 2)
    b = f(x + 1, "db2", 2)
    assert a.shape == b.shape == (2, 8, 8)  # per-mode even dims pack 1:1


def test_float32_accuracy(rng):
    # f32 on the compute path: round-trip error should stay ~1e-6 relative.
    x = rng.standard_normal((16, 64, 64)).astype(np.float32)
    arr = dj.wavedec2_packed(jnp.asarray(x), "bior4.4", 3)
    rec = dj.waverec2_packed(arr, "bior4.4", 3, 64, 64)
    err = np.max(np.abs(np.asarray(rec) - x))
    assert err < 5e-6
