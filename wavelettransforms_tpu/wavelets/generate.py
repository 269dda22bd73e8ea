"""Numerical construction of wavelet filter banks.

The runtime has no PyWavelets dependency: every filter bank is either constructed
analytically here (Daubechies via spectral factorization, biorthogonal splines /
CDF 9/7 via polynomial factorization) or taken from embedded high-precision seed
tables and *polished* to machine precision with a Gauss-Newton solve of the exact
defining equations (orthonormality + vanishing moments).

Reference parity target: the filter tables of PyWavelets (used by the reference
via ``pywt.Wavelet(name)``, see /root/reference/ResNet/dwt_pruning.py:13).

All math here is plain float64 NumPy and runs once at import/registry-build time.
"""
from __future__ import annotations

import math

import numpy as np

SQRT2 = math.sqrt(2.0)


# ---------------------------------------------------------------------------
# Polynomial helpers (coefficient arrays, lowest degree first)
# ---------------------------------------------------------------------------

def _poly_mul(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return np.convolve(np.asarray(a, dtype=np.float64), np.asarray(b, dtype=np.float64))


def _poly_pow(a: np.ndarray, n: int) -> np.ndarray:
    out = np.array([1.0])
    for _ in range(n):
        out = _poly_mul(out, a)
    return out


def _binomial_poly_P(K: int) -> np.ndarray:
    """P(y) = sum_{k=0}^{K-1} C(K-1+k, k) y^k  (Daubechies half-band remainder)."""
    return np.array([math.comb(K - 1 + k, k) for k in range(K)], dtype=np.float64)


def _subst_y_of_z(p_y: np.ndarray) -> np.ndarray:
    """Given P(y), return the symmetric Laurent polynomial P(y(z)) with
    y(z) = (2 - z - 1/z)/4, represented as a plain polynomial in z after
    multiplying by z^(deg P).  Coefficients are symmetric around the center.
    """
    # u(z) = y(z) * z = (2z - z^2 - 1)/4, a degree-2 polynomial in z.
    u = np.array([-1.0, 2.0, -1.0]) / 4.0  # -1/4 + z/2 - z^2/4
    deg = len(p_y) - 1
    out = np.zeros(1)
    for k, c in enumerate(p_y):
        # term: c * u(z)^k * z^(deg-k)
        term = c * _poly_pow(u, k)
        term = np.concatenate([np.zeros(deg - k), term])
        n = max(len(out), len(term))
        out = np.pad(out, (0, n - len(out))) + np.pad(term, (0, n - len(term)))
    return out


# ---------------------------------------------------------------------------
# Daubechies (extremal phase) via spectral factorization
# ---------------------------------------------------------------------------

def daubechies_scaling_filter(N: int) -> np.ndarray:
    """Length-2N Daubechies-N scaling filter (synthesis lowpass / ``rec_lo``),
    minimum-phase selection, normalized so sum(h) = sqrt(2).

    Matches the classic db tables (db2 = [(1+√3)/4√2, ...]).
    """
    if N == 1:
        return np.array([1.0, 1.0]) / SQRT2
    # Laurent polynomial of P(y(z)) lifted to a plain polynomial of degree 2N-2.
    q = _subst_y_of_z(_binomial_poly_P(N))
    roots = np.roots(q[::-1])  # np.roots wants highest-degree first
    inside = roots[np.abs(roots) < 1.0]
    assert len(inside) == N - 1, (N, np.abs(roots))
    # m(z) = prod (z - r_i) over the inside roots -> real coefficients.
    m = np.array([1.0])
    for r in inside:
        m = np.convolve(m, np.array([1.0, -r]))
    m = np.real(m)
    # h(z) = c * ((1+z)/2)^N * m(z)
    h = _poly_mul(_poly_pow(np.array([0.5, 0.5]), N), m)
    h = h * (SQRT2 / np.sum(h))
    # Extremal-phase convention: energy concentrated at the front, h[0] > 0.
    if abs(h[0]) < abs(h[-1]):
        h = h[::-1]
    if h[0] < 0:
        h = -h
    return h


# ---------------------------------------------------------------------------
# Gauss-Newton polish of orthogonal filters (symlets, coiflets)
# ---------------------------------------------------------------------------

def _orthogonality_residuals(h: np.ndarray) -> np.ndarray:
    L = len(h)
    res = []
    for m in range(L // 2):
        v = float(np.dot(h[: L - 2 * m], h[2 * m:]))
        res.append(v - (1.0 if m == 0 else 0.0))
    return np.array(res)


def _psi_moment_residuals(h: np.ndarray, nmoments: int) -> np.ndarray:
    # Vanishing moments of the wavelet <=> zeros of H at z = -1:
    # sum_n (-1)^n n^p h[n] = 0 for p = 0..nmoments-1.  Evaluated in a centered,
    # scaled monomial basis t^p (same span) to avoid catastrophic cancellation
    # for long filters.
    L = len(h)
    n = np.arange(L, dtype=np.float64)
    t = (2.0 * n - (L - 1)) / L
    sign = (-1.0) ** n
    return np.array([float(np.sum(sign * t**p * h)) for p in range(nmoments)])


def _phi_moment_residuals(h: np.ndarray, center: int, nmoments: int) -> np.ndarray:
    # Coiflet condition: moments of the *scaling* function vanish around an
    # integer center c: sum_n (n - c)^p h[n] = 0 for p = 1..nmoments.
    # Same span in the scaled basis ((n - c)/s)^p.
    L = len(h)
    t = (np.arange(L, dtype=np.float64) - center) / max(L / 2.0, 1.0)
    return np.array([float(np.sum(t**p * h)) for p in range(1, nmoments + 1)])


def _sum_residual(h: np.ndarray) -> np.ndarray:
    return np.array([float(np.sum(h)) - SQRT2])


def polish_orthogonal_filter(
    seed: np.ndarray,
    psi_moments: int,
    phi_moments: int = 0,
    iters: int = 60,
) -> np.ndarray:
    """Gauss-Newton refinement of an orthogonal scaling filter onto the exact
    manifold {orthonormal shifts} ∩ {psi_moments wavelet vanishing moments}
    (∩ {phi_moments scaling-function vanishing moments} for coiflets).

    The seed only needs a few correct digits; the defining equations pin the
    filter to machine precision.  Raises if the polish does not converge, so a
    bad seed cannot silently ship a wrong filter bank.
    """
    h = np.asarray(seed, dtype=np.float64).copy()
    center = int(round(float(np.sum(np.arange(len(h)) * h)) / SQRT2)) if phi_moments else 0

    def residuals(hh: np.ndarray) -> np.ndarray:
        parts = [
            _orthogonality_residuals(hh),
            _psi_moment_residuals(hh, psi_moments),
            _sum_residual(hh),
        ]
        if phi_moments:
            parts.append(_phi_moment_residuals(hh, center, phi_moments))
        return np.concatenate(parts)

    for _ in range(iters):
        r = residuals(h)
        if np.max(np.abs(r)) < 1e-14:
            break
        # Central-difference Jacobian (filters are tiny; this is exact enough).
        J = np.zeros((len(r), len(h)))
        eps = 1e-6
        for j in range(len(h)):
            hp, hm = h.copy(), h.copy()
            hp[j] += eps
            hm[j] -= eps
            J[:, j] = (residuals(hp) - residuals(hm)) / (2 * eps)
        step, *_ = np.linalg.lstsq(J, -r, rcond=None)
        h = h + step
    r = residuals(h)
    if np.max(np.abs(r)) > 1e-10:
        raise ValueError(
            f"filter polish failed to converge (max residual {np.max(np.abs(r)):.3e})"
        )
    return h


# ---------------------------------------------------------------------------
# Biorthogonal spline (bior) / CDF families
# ---------------------------------------------------------------------------

def spline_bior_pair(nr: int, nd: int) -> tuple[np.ndarray, np.ndarray]:
    """Spline biorthogonal pair (h_synthesis, h_analysis) for biorNr.Nd where the
    synthesis lowpass is the order-Nr binomial (B-spline) filter and the analysis
    lowpass carries the full Daubechies remainder polynomial.

    Both normalized to sum = sqrt(2).  Used for bior1.3 and bior2.2.
    """
    K = (nr + nd) // 2
    h = _poly_pow(np.array([0.5, 0.5]), nr)
    h = h * (SQRT2 / np.sum(h))
    ht = _poly_mul(_poly_pow(np.array([0.5, 0.5]), nd), _subst_y_of_z(_binomial_poly_P(K)))
    ht = ht * (SQRT2 / np.sum(ht))
    return h, ht


def cdf97_pair() -> tuple[np.ndarray, np.ndarray]:
    """CDF 9/7 pair = pywt's bior4.4: (h_synthesis 7 taps, h_analysis 9 taps).

    Construction: P(y) = 1 + 4y + 10y^2 + 20y^3 is split into its real linear
    factor (synthesis) and complex-conjugate quadratic factor (analysis); both
    sides then get ((1+z)/2)^4 spline factors.
    """
    P = np.array([1.0, 4.0, 10.0, 20.0])
    roots = np.roots(P[::-1])
    real_mask = np.abs(np.imag(roots)) < 1e-9
    y0 = float(np.real(roots[real_mask][0]))
    c1, c2 = roots[~real_mask]
    # linear factor in y, normalized to match P's leading structure
    lin = np.array([-y0, 1.0])  # (y - y0)
    quad = np.real(np.array([c1 * c2, -(c1 + c2), 1.0]))  # (y - c1)(y - c2)
    # overall scale: lin * quad * 20 == P
    spline4 = _poly_pow(np.array([0.5, 0.5]), 4)
    h = _poly_mul(spline4, _subst_y_of_z(lin))
    ht = _poly_mul(spline4, _subst_y_of_z(quad))
    h = h * (SQRT2 / np.sum(h))
    ht = ht * (SQRT2 / np.sum(ht))
    return h, ht


def qmf_highpass(rec_lo: np.ndarray) -> np.ndarray:
    """Quadrature-mirror highpass g[n] = (-1)^n h[L-1-n] (orthogonal case)."""
    L = len(rec_lo)
    n = np.arange(L)
    return ((-1.0) ** n) * rec_lo[::-1]


def verify_orthogonal_bank(rec_lo: np.ndarray, atol: float = 1e-10) -> None:
    r = _orthogonality_residuals(rec_lo)
    if np.max(np.abs(r)) > atol:
        raise ValueError(f"orthogonality violated: {np.max(np.abs(r)):.3e}")
    if abs(float(np.sum(rec_lo)) - SQRT2) > atol:
        raise ValueError("sum(h) != sqrt(2)")


def verify_biorthogonal_pair(h: np.ndarray, ht: np.ndarray, off: int, atol: float = 1e-9) -> None:
    """Check sum_n h[n] ht[n + 2m - off] = delta_m for the aligned pair."""
    L = len(h)
    Lt = len(ht)
    for m in range(-(Lt // 2), L // 2 + 1):
        s = 0.0
        for n in range(L):
            j = n + 2 * m - off
            if 0 <= j < Lt:
                s += h[n] * ht[j]
        target = 1.0 if m == 0 else 0.0
        if abs(s - target) > atol:
            raise ValueError(f"biorthogonality violated at shift {m}: {s}")
