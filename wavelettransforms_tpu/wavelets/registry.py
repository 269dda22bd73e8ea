"""Wavelet filter-bank registry.

TPU-native replacement for the ``pywt.Wavelet`` objects the reference consumed
(/root/reference/ResNet/dwt_pruning.py:13 and the CLI enum in
/root/reference/ResNet/main_pruning.py:89-96).  The registry is pure data:
four float64 filters per wavelet in pywt storage convention, built once and
cached.  Compute engines (numpy / jax / pallas) read filters from here.

Storage convention (pywt-compatible):
    dec_lo[n] = rec_lo[L-1-n]           (orthogonal case)
    dec_hi[n] = (-1)^(n+1) * rec_lo[n]
    rec_hi[n] = (-1)^n     * dec_lo[n]
All four filters have the same even length ``L``; biorthogonal banks are
zero-padded to a common even length with pywt's alignment (analysis
right-aligned, synthesis centered).
"""
from __future__ import annotations

import functools
import math
from dataclasses import dataclass, field

import numpy as np

from . import generate as gen
from ._tables import COIF_DEC_LO_SEEDS, SYM_DEC_LO_SEEDS


@dataclass(frozen=True)
class Wavelet:
    """A discrete wavelet filter bank (pywt-convention storage)."""

    name: str
    family: str
    dec_lo: np.ndarray
    dec_hi: np.ndarray
    rec_lo: np.ndarray
    rec_hi: np.ndarray
    orthogonal: bool
    biorthogonal: bool
    vanishing_moments_psi: int = 0
    vanishing_moments_phi: int = 0

    @property
    def dec_len(self) -> int:
        return len(self.dec_lo)

    @property
    def rec_len(self) -> int:
        return len(self.rec_lo)

    @property
    def filter_bank(self):
        return (self.dec_lo, self.dec_hi, self.rec_lo, self.rec_hi)

    def __repr__(self) -> str:  # pragma: no cover
        return f"Wavelet({self.name}, L={self.dec_len})"


def _freeze(a) -> np.ndarray:
    out = np.asarray(a, dtype=np.float64)
    out.setflags(write=False)
    return out


def _bank_from_rec_lo(name: str, family: str, rec_lo: np.ndarray, psi: int,
                      phi: int = 0) -> Wavelet:
    """Orthogonal bank from a scaling filter (sum = sqrt2, orthonormal)."""
    rec_lo = np.asarray(rec_lo, dtype=np.float64)
    L = len(rec_lo)
    n = np.arange(L)
    dec_lo = rec_lo[::-1].copy()
    dec_hi = ((-1.0) ** (n + 1)) * rec_lo
    rec_hi = ((-1.0) ** n) * dec_lo
    gen.verify_orthogonal_bank(rec_lo)
    return Wavelet(
        name=name, family=family,
        dec_lo=_freeze(dec_lo), dec_hi=_freeze(dec_hi),
        rec_lo=_freeze(rec_lo), rec_hi=_freeze(rec_hi),
        orthogonal=True, biorthogonal=True,
        vanishing_moments_psi=psi, vanishing_moments_phi=phi,
    )


def _pad_bior(h_syn: np.ndarray, h_ana: np.ndarray):
    """Zero-pad a biorthogonal pair to pywt's common even length & alignment.

    Analysis (longer) filter is right-aligned (zeros on the left); synthesis is
    centered with the extra zero on the right — this reproduces the pywt tables
    for bior1.3 / bior2.2 / bior4.4 verified against the published values.
    Returns (dec_lo, rec_lo).
    """
    la, ls = len(h_ana), len(h_syn)
    L = max(la, ls)
    L = L + (L % 2)
    dec_lo = np.concatenate([np.zeros(L - la), h_ana])
    lpad = (L - ls) // 2
    rec_lo = np.concatenate([np.zeros(lpad), h_syn, np.zeros(L - ls - lpad)])
    return dec_lo, rec_lo


def _bank_biorthogonal(name: str, family: str, dec_lo: np.ndarray,
                       rec_lo: np.ndarray, psi: int, phi: int) -> Wavelet:
    dec_lo = np.asarray(dec_lo, dtype=np.float64)
    rec_lo = np.asarray(rec_lo, dtype=np.float64)
    assert len(dec_lo) == len(rec_lo) and len(dec_lo) % 2 == 0
    n = np.arange(len(dec_lo))
    dec_hi = ((-1.0) ** (n + 1)) * rec_lo
    rec_hi = ((-1.0) ** n) * dec_lo
    return Wavelet(
        name=name, family=family,
        dec_lo=_freeze(dec_lo), dec_hi=_freeze(dec_hi),
        rec_lo=_freeze(rec_lo), rec_hi=_freeze(rec_hi),
        orthogonal=False, biorthogonal=True,
        vanishing_moments_psi=psi, vanishing_moments_phi=phi,
    )


# ---------------------------------------------------------------------------
# Family builders
# ---------------------------------------------------------------------------

def _build_haar() -> Wavelet:
    w = _bank_from_rec_lo("haar", "haar", gen.daubechies_scaling_filter(1), psi=1)
    return w


def _build_db(n: int) -> Wavelet:
    return _bank_from_rec_lo(f"db{n}", "db", gen.daubechies_scaling_filter(n), psi=n)


def _build_sym(n: int) -> Wavelet:
    if n in (2, 3):  # sym2/sym3 coincide with db2/db3
        rec_lo = gen.daubechies_scaling_filter(n)
    else:
        seed_dec = np.asarray(SYM_DEC_LO_SEEDS[n], dtype=np.float64)
        rec_lo = gen.polish_orthogonal_filter(seed_dec[::-1], psi_moments=n)
    return _bank_from_rec_lo(f"sym{n}", "sym", rec_lo, psi=n)


def _build_coif(k: int) -> Wavelet:
    seed_dec = np.asarray(COIF_DEC_LO_SEEDS[k], dtype=np.float64)
    rec_lo = gen.polish_orthogonal_filter(
        seed_dec[::-1], psi_moments=2 * k, phi_moments=2 * k - 1
    )
    return _bank_from_rec_lo(f"coif{k}", "coif", rec_lo, psi=2 * k, phi=2 * k - 1)


def _build_bior(nr: int, nd: int) -> Wavelet:
    if (nr, nd) == (4, 4):
        h_syn, h_ana = gen.cdf97_pair()
    else:
        h_syn, h_ana = gen.spline_bior_pair(nr, nd)
    dec_lo, rec_lo = _pad_bior(h_syn, h_ana)
    return _bank_biorthogonal(f"bior{nr}.{nd}", "bior", dec_lo, rec_lo,
                              psi=nd, phi=nr)


def _build_rbio(nr: int, nd: int) -> Wavelet:
    """Reverse biorthogonal: the bior pair with analysis/synthesis roles
    swapped (filters reversed, as pywt does)."""
    b = _build_bior(nr, nd)
    dec_lo = b.rec_lo[::-1].copy()
    rec_lo = b.dec_lo[::-1].copy()
    return _bank_biorthogonal(f"rbio{nr}.{nd}", "rbio", dec_lo, rec_lo,
                              psi=nr, phi=nd)


_BIOR_ORDERS = [
    (1, 1), (1, 3), (1, 5),
    (2, 2), (2, 4), (2, 6), (2, 8),
    (3, 1), (3, 3), (3, 5), (3, 7), (3, 9),
    (4, 4),
]

_BUILDERS = {"haar": _build_haar}
for _n in range(1, 11):
    _BUILDERS[f"db{_n}"] = functools.partial(_build_db, _n)
for _n in list(SYM_DEC_LO_SEEDS) + [2, 3]:
    _BUILDERS[f"sym{_n}"] = functools.partial(_build_sym, _n)
for _k in COIF_DEC_LO_SEEDS:
    _BUILDERS[f"coif{_k}"] = functools.partial(_build_coif, _k)
for _nr, _nd in _BIOR_ORDERS:
    _BUILDERS[f"bior{_nr}.{_nd}"] = functools.partial(_build_bior, _nr, _nd)
    _BUILDERS[f"rbio{_nr}.{_nd}"] = functools.partial(_build_rbio, _nr, _nd)


@functools.lru_cache(maxsize=None)
def get_wavelet(name: str) -> Wavelet:
    """Look up (and lazily build + verify) a wavelet filter bank by name."""
    key = name.lower().strip()
    if key not in _BUILDERS:
        raise ValueError(
            f"Unknown wavelet '{name}'. Available: {', '.join(sorted(_BUILDERS))}"
        )
    return _BUILDERS[key]()


def wavelist() -> list[str]:
    return sorted(_BUILDERS)


# Reference CLI enum (/root/reference/ResNet/main_pruning.py:89-96).
REFERENCE_WAVELETS = [
    "haar",
    "db1", "db2", "db4", "db6",
    "coif1", "coif2", "coif3",
    "bior1.3", "bior2.2", "bior4.4",
    "rbio1.3", "rbio2.2", "rbio4.4",
    "sym2", "sym4", "sym6",
]


def dwt_max_level(data_len: int, filter_len) -> int:
    """Maximum useful decomposition level; pywt.dwt_max_level semantics
    (used for the reference's level clamp, /root/reference/ResNet/dwt_pruning.py:12-13):
    floor(log2(data_len / (filter_len - 1))), clamped at 0.
    """
    if isinstance(filter_len, Wavelet):
        filter_len = filter_len.dec_len
    elif isinstance(filter_len, str):
        filter_len = get_wavelet(filter_len).dec_len
    if filter_len <= 1 or data_len < filter_len - 1:
        return 0
    return max(0, int(math.log2(data_len / (filter_len - 1.0))))
