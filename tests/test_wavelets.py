"""Filter-bank registry tests: analytic invariants + known golden values."""
import math

import numpy as np
import pytest

from wavelettransforms_tpu.wavelets import (
    REFERENCE_WAVELETS, dwt_max_level, get_wavelet, wavelist)

SQRT2 = math.sqrt(2.0)


def test_reference_enum_complete():
    # Every wavelet the reference CLI exposes must resolve
    # (/root/reference/ResNet/main_pruning.py:89-96).
    for name in REFERENCE_WAVELETS:
        assert get_wavelet(name).dec_len >= 2


@pytest.mark.parametrize("name", wavelist())
def test_bank_shapes(name):
    w = get_wavelet(name)
    assert w.dec_len == w.rec_len
    assert w.dec_len % 2 == 0
    for f in w.filter_bank:
        assert len(f) == w.dec_len


@pytest.mark.parametrize("name", [n for n in wavelist()
                                  if get_wavelet(n).orthogonal])
def test_orthogonal_banks(name):
    w = get_wavelet(name)
    h = w.rec_lo
    L = len(h)
    # orthonormal shifts
    for m in range(L // 2):
        v = float(np.dot(h[: L - 2 * m], h[2 * m:]))
        assert abs(v - (1.0 if m == 0 else 0.0)) < 1e-10
    assert abs(float(np.sum(h)) - SQRT2) < 1e-10
    # QMF relations (pywt convention)
    n = np.arange(L)
    np.testing.assert_allclose(w.dec_lo, h[::-1], atol=0)
    np.testing.assert_allclose(w.dec_hi, ((-1.0) ** (n + 1)) * h, atol=0)
    np.testing.assert_allclose(w.rec_hi, ((-1.0) ** n) * w.dec_lo, atol=0)


def test_db2_golden():
    # (1+sqrt3)/(4 sqrt2) etc. — textbook db2 values.
    s3 = math.sqrt(3.0)
    expected = np.array([1 + s3, 3 + s3, 3 - s3, 1 - s3]) / (4 * SQRT2)
    np.testing.assert_allclose(get_wavelet("db2").rec_lo, expected, atol=1e-12)


def test_haar_exact():
    w = get_wavelet("haar")
    np.testing.assert_allclose(w.rec_lo, [1 / SQRT2, 1 / SQRT2], atol=0)
    np.testing.assert_allclose(w.dec_hi, [-1 / SQRT2, 1 / SQRT2], atol=0)


def test_bior22_golden():
    # CDF 5/3 (LeGall) closed form: sqrt2*[-1/8,1/4,3/4,1/4,-1/8] analysis.
    w = get_wavelet("bior2.2")
    np.testing.assert_allclose(
        w.dec_lo, SQRT2 * np.array([0, -1 / 8, 1 / 4, 3 / 4, 1 / 4, -1 / 8]),
        atol=1e-12)
    np.testing.assert_allclose(
        w.rec_lo, SQRT2 * np.array([0, 1 / 4, 1 / 2, 1 / 4, 0, 0]), atol=1e-12)


def test_bior44_is_cdf97():
    # pywt's bior4.4 == CDF 9/7 (JPEG2000); spot-check the published values.
    w = get_wavelet("bior4.4")
    assert abs(w.dec_lo[5] - 0.8526986790088938) < 1e-10
    assert abs(w.rec_lo[4] - 0.7884856164055829) < 1e-10


@pytest.mark.parametrize("name", [n for n in wavelist()
                                  if not get_wavelet(n).orthogonal])
def test_biorthogonal_duality(name):
    # sum_n dec_lo[n] * rec_lo_rev[n + 2m] relations are exercised end-to-end
    # by perfect reconstruction in test_dwt_numpy; here check normalization.
    w = get_wavelet(name)
    assert abs(np.sum(w.dec_lo) - SQRT2) < 1e-9
    assert abs(np.sum(w.rec_lo) - SQRT2) < 1e-9


def test_dwt_max_level_reference_semantics():
    # The clamp that drives the reference's behavior on conv kernels
    # (/root/reference/ResNet/dwt_pruning.py:12-13).
    assert dwt_max_level(3, "haar") == 1
    assert dwt_max_level(7, "haar") == 2
    assert dwt_max_level(1, "haar") == 0
    assert dwt_max_level(3, "bior4.4") == 0   # dec_len 10 -> no transform
    assert dwt_max_level(7, "bior4.4") == 0
    assert dwt_max_level(224, "db2") == 6
    assert dwt_max_level(0, "haar") == 0
