"""NumPy reference DWT engine (the correctness oracle).

Replicates the PyWavelets semantics the reference relies on
(/root/reference/ResNet/dwt_pruning.py:67-77: ``wavedec2 / waverec2 /
coeffs_to_array / array_to_coeffs`` with ``mode='periodization'``,
``axes=(-2, -1)``), implemented from first principles on top of the filter
registry — the runtime has no pywt dependency.

Design: every 1-D DWT/IDWT is an explicit linear operator; we build (and
cache) the dense analysis/synthesis matrices per (N, wavelet, mode).  This
makes the oracle trivially auditable, makes perfect-reconstruction testable as
a matrix identity, and provides the exact operators reused by the JAX engine's
small-axis matmul path (conv weights have 1x1 .. 7x7 kernels, where the DWT is
a tiny matmul batched over channels — the MXU-friendly formulation).

Conventions (pywt-compatible):
  * periodization: out_len = ceil(N/2); odd N extended by repeating the last
    sample; a[k] = sum_j dec_lo[j] * x[(2k + F/2 - j) mod N'].
  * other modes:   out_len = floor((N + F - 1) / 2); signal extended by F-1
    on each side; a[k] = sum_j dec_lo[j] * ext[2k + 1 - j + (F - 1)].
  * synthesis is the matching left inverse built from the *reversed*
    reconstruction filters (transpose structure); for periodization it is an
    exact inverse, for other modes it inverts dwt up to the standard
    2*len(cA) - F + 2 output length.
"""
from __future__ import annotations

import functools
import math

import numpy as np

from ..wavelets import Wavelet, get_wavelet

Modes = ("periodization", "symmetric", "reflect", "zero", "periodic", "constant")


def _as_wavelet(wavelet) -> Wavelet:
    return wavelet if isinstance(wavelet, Wavelet) else get_wavelet(wavelet)


def dwt_coeff_len(data_len: int, filter_len: int, mode: str) -> int:
    if mode == "periodization":
        return (data_len + 1) // 2
    return (data_len + filter_len - 1) // 2


# ---------------------------------------------------------------------------
# Signal extension matrices
# ---------------------------------------------------------------------------

def _extension_indices(n: int, pad: int, mode: str) -> np.ndarray:
    """Index map for the padded signal of length n + 2*pad (non-per modes).

    Returns integer indices into the original signal; -1 marks zero samples.
    """
    idx = np.arange(-pad, n + pad)
    out = np.empty_like(idx)
    for i, t in enumerate(idx):
        if 0 <= t < n:
            out[i] = t
        elif mode == "zero":
            out[i] = -1
        elif mode == "constant":
            out[i] = 0 if t < 0 else n - 1
        elif mode == "periodic":
            out[i] = t % n
        elif mode == "symmetric":
            # half-sample symmetry: ... x1 x0 | x0 x1 ... xn-1 | xn-1 ...
            p = t % (2 * n)
            out[i] = p if p < n else 2 * n - 1 - p
        elif mode == "reflect":
            # whole-sample symmetry: ... x2 x1 | x0 x1 ... | xn-2 ...
            if n == 1:
                out[i] = 0
            else:
                p = t % (2 * n - 2)
                out[i] = p if p < n else 2 * n - 2 - p
        else:
            raise ValueError(f"unknown mode {mode}")
    return out


# ---------------------------------------------------------------------------
# Dense operator construction (cached per (N, wavelet, mode))
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _analysis_matrices(n: int, wavelet_name: str, mode: str):
    """(A_lo, A_hi): each (out_len, n) float64, y = A @ x."""
    w = get_wavelet(wavelet_name)
    F = w.dec_len
    if mode == "periodization":
        n_ext = n + (n % 2)
        out_len = n_ext // 2
        A_lo = np.zeros((out_len, n_ext))
        A_hi = np.zeros((out_len, n_ext))
        off = F // 2
        for k in range(out_len):
            for j in range(F):
                src = (2 * k + off - j) % n_ext
                A_lo[k, src] += w.dec_lo[j]
                A_hi[k, src] += w.dec_hi[j]
        if n_ext != n:  # odd length: repeat last sample
            E = np.zeros((n_ext, n))
            E[np.arange(n), np.arange(n)] = 1.0
            E[n, n - 1] = 1.0
            A_lo = A_lo @ E
            A_hi = A_hi @ E
    else:
        pad = F - 1
        ext = _extension_indices(n, pad, mode)
        n_ext = len(ext)
        out_len = dwt_coeff_len(n, F, mode)
        A_lo = np.zeros((out_len, n))
        A_hi = np.zeros((out_len, n))
        for k in range(out_len):
            for j in range(F):
                e = 2 * k + 1 - j + pad
                if 0 <= e < n_ext and ext[e] >= 0:
                    A_lo[k, ext[e]] += w.dec_lo[j]
                    A_hi[k, ext[e]] += w.dec_hi[j]
    A_lo.setflags(write=False)
    A_hi.setflags(write=False)
    return A_lo, A_hi


@functools.lru_cache(maxsize=None)
def _synthesis_matrices(out_n: int, wavelet_name: str, mode: str):
    """(S_lo, S_hi): each (rec_len_out, out_n) float64; x = S_lo@a + S_hi@d.

    ``out_n`` is the coefficient length (len(cA) == len(cD)).
    rec_len_out = 2*out_n for periodization, 2*out_n - F + 2 otherwise.
    """
    w = get_wavelet(wavelet_name)
    F = w.rec_len
    rlo = w.rec_lo[::-1]
    rhi = w.rec_hi[::-1]
    if mode == "periodization":
        n = 2 * out_n
        S_lo = np.zeros((n, out_n))
        S_hi = np.zeros((n, out_n))
        off = F // 2
        for k in range(out_n):
            for j in range(F):
                dst = (2 * k + off - j) % n
                S_lo[dst, k] += rlo[j]
                S_hi[dst, k] += rhi[j]
    else:
        n = 2 * out_n - F + 2
        if n <= 0:
            raise ValueError(
                f"coefficient length {out_n} too small for filter length {F}")
        S_lo = np.zeros((n, out_n))
        S_hi = np.zeros((n, out_n))
        # transpose of the analysis structure restricted to interior samples:
        # x[i] gets a[k]*rec_lo_rev[j] where i = 2k + 1 - j + (F-1) - (F-1) ...
        # standard upsample-convolve: x[i] = sum_k a[k] * rec_lo[i - 2k + F - 2]
        for i in range(n):
            for k in range(out_n):
                j = i - 2 * k + F - 2
                if 0 <= j < F:
                    S_lo[i, k] += w.rec_lo[j]
                    S_hi[i, k] += w.rec_hi[j]
    S_lo.setflags(write=False)
    S_hi.setflags(write=False)
    return S_lo, S_hi


def analysis_operator(n: int, wavelet, mode: str = "periodization") -> np.ndarray:
    """Stacked [A_lo; A_hi] (2*out_len, n) — the full 1-D DWT as one matrix."""
    w = _as_wavelet(wavelet)
    A_lo, A_hi = _analysis_matrices(n, w.name, mode)
    return np.concatenate([A_lo, A_hi], axis=0)


def synthesis_operator(out_n: int, wavelet, mode: str = "periodization") -> np.ndarray:
    w = _as_wavelet(wavelet)
    S_lo, S_hi = _synthesis_matrices(out_n, w.name, mode)
    return np.concatenate([S_lo, S_hi], axis=1)


# ---------------------------------------------------------------------------
# 1-D transforms (batched over leading axes)
# ---------------------------------------------------------------------------

def _apply_matrix(M: np.ndarray, x: np.ndarray, axis: int) -> np.ndarray:
    x = np.moveaxis(x, axis, -1)
    y = x @ M.T
    return np.moveaxis(y, -1, axis)


def dwt(x: np.ndarray, wavelet, mode: str = "periodization", axis: int = -1):
    """Single-level 1-D DWT along ``axis``.  Returns (cA, cD)."""
    w = _as_wavelet(wavelet)
    n = x.shape[axis]
    A_lo, A_hi = _analysis_matrices(n, w.name, mode)
    return _apply_matrix(A_lo, x, axis), _apply_matrix(A_hi, x, axis)


def idwt(cA: np.ndarray, cD: np.ndarray, wavelet, mode: str = "periodization",
         axis: int = -1):
    w = _as_wavelet(wavelet)
    n = cA.shape[axis]
    if cD.shape[axis] != n:
        raise ValueError("cA/cD length mismatch")
    S_lo, S_hi = _synthesis_matrices(n, w.name, mode)
    return _apply_matrix(S_lo, cA, axis) + _apply_matrix(S_hi, cD, axis)


# ---------------------------------------------------------------------------
# 2-D transforms over arbitrary axes (default last two), leading dims batched
# ---------------------------------------------------------------------------

def dwt2(x: np.ndarray, wavelet, mode: str = "periodization",
         axes=(-2, -1)):
    """Single-level 2-D DWT.  Returns (cA, (cH, cV, cD)) in pywt order:
    cH = detail along axes[0], cV = detail along axes[1], cD = both."""
    ax0, ax1 = axes
    a0, d0 = dwt(x, wavelet, mode, axis=ax0)
    aa, ad = dwt(a0, wavelet, mode, axis=ax1)
    da, dd = dwt(d0, wavelet, mode, axis=ax1)
    return aa, (da, ad, dd)


def idwt2(coeffs, wavelet, mode: str = "periodization", axes=(-2, -1)):
    cA, (cH, cV, cD) = coeffs
    ax0, ax1 = axes
    a0 = idwt(cA, cV, wavelet, mode, axis=ax1)
    d0 = idwt(cH, cD, wavelet, mode, axis=ax1)
    return idwt(a0, d0, wavelet, mode, axis=ax0)


def wavedec2(x: np.ndarray, wavelet, level: int, mode: str = "periodization",
             axes=(-2, -1)):
    """Multi-level 2-D DWT (Mallat recursion on the approximation band).

    Returns [cA_L, (cH_L, cV_L, cD_L), ..., (cH_1, cV_1, cD_1)];
    level == 0 returns [x] (no transform) — the reference's clamped-level
    behavior for small kernels (/root/reference/ResNet/dwt_pruning.py:64-65).
    """
    if level < 0:
        raise ValueError("level must be >= 0")
    coeffs = []
    a = x
    for _ in range(level):
        a, details = dwt2(a, wavelet, mode, axes)
        coeffs.append(details)
    return [a] + coeffs[::-1]


def waverec2(coeffs, wavelet, mode: str = "periodization", axes=(-2, -1)):
    a = coeffs[0]
    for details in coeffs[1:]:
        cH = details[0]
        # Crop the running approximation if one level produced a longer
        # output than the next details expect (odd-length periodization).
        for ax, want in zip(axes, (cH.shape[axes[0]], cH.shape[axes[1]])):
            if a.shape[ax] > want:
                a = np.take(a, np.arange(want), axis=ax)
        a = idwt2((a, details), wavelet, mode, axes)
    return a


# ---------------------------------------------------------------------------
# Packed-array layout (pywt.coeffs_to_array / array_to_coeffs equivalent)
# ---------------------------------------------------------------------------

def coeffs_to_array(coeffs, axes=(-2, -1), padding: float = 0.0):
    """Pack wavedec2 coefficients into a single mosaic array along ``axes``.

    Layout per level (along the two transform axes):
        [[approx, cV],
         [cH,     cD]]
    recursively for the approximation.  When block shapes do not tile exactly
    (odd-length periodization at deep levels) the gaps are filled with
    ``padding`` — pywt.coeffs_to_array semantics (default padding=0), which
    matters for parity because the reference computes its percentile over the
    padded mosaic (/root/reference/ResNet/dwt_pruning.py:69-73).

    Returns (arr, slices): slices[0] = final-approximation slice pair along the
    two axes; slices[i>0] = dict with 'da' (cH), 'ad' (cV), 'dd' (cD) pairs.
    """
    a = coeffs[0]
    ax0, ax1 = axes
    ndim = a.ndim
    ax0 %= ndim
    ax1 %= ndim

    def pack2(arr2, details2):
        """arr2/details ordered with the two transform axes LAST."""
        cH, cV, cD = details2
        h0, w0 = arr2.shape[-2:]
        hh, hw = cH.shape[-2:]
        vh, vw = cV.shape[-2:]
        dh, dw = cD.shape[-2:]
        H, W = h0 + hh, w0 + vw
        batch = arr2.shape[:-2]
        out = np.full(batch + (H, W), padding, dtype=arr2.dtype)
        out[..., :h0, :w0] = arr2
        out[..., :vh, w0:w0 + vw] = cV
        out[..., h0:h0 + hh, :hw] = cH
        out[..., h0:h0 + dh, w0:w0 + dw] = cD
        sl = {
            "ad": (slice(0, vh), slice(w0, w0 + vw)),        # cV
            "da": (slice(h0, h0 + hh), slice(0, hw)),        # cH
            "dd": (slice(h0, h0 + dh), slice(w0, w0 + dw)),  # cD
        }
        return out, sl

    # Normalize to axes == last two for simplicity, then restore at the end.
    simple = (ax0, ax1) == (ndim - 2, ndim - 1)
    if not simple:
        move = lambda x: np.moveaxis(x, (ax0, ax1), (-2, -1))
        unmove = lambda x: np.moveaxis(x, (-2, -1), (ax0, ax1))
    else:
        move = unmove = lambda x: x

    arr = move(a)
    slices = [(slice(0, arr.shape[-2]), slice(0, arr.shape[-1]))]
    levels = []
    for details in coeffs[1:]:
        arr, sl = pack2(arr, tuple(move(d) for d in details))
        levels.append(sl)
    return unmove(arr), [slices[0]] + levels


def _slice_nd(arr: np.ndarray, sl, axes):
    ax0, ax1 = axes
    index = [slice(None)] * arr.ndim
    index[ax0 % arr.ndim] = sl[0]
    index[ax1 % arr.ndim] = sl[1]
    return arr[tuple(index)]


def array_to_coeffs(arr: np.ndarray, slices, axes=(-2, -1)):
    """Inverse of coeffs_to_array (wavedec2 output format)."""
    out = [_slice_nd(arr, slices[0], axes)]
    for level in slices[1:]:
        cH = _slice_nd(arr, level["da"], axes)
        cV = _slice_nd(arr, level["ad"], axes)
        cD = _slice_nd(arr, level["dd"], axes)
        out.append((cH, cV, cD))
    return out


def packed_shape(h: int, w: int, level: int) -> tuple[int, int]:
    """Packed-mosaic shape along the two transform axes for ``level``
    periodization decompositions of an (h, w) tile (detail sizes are
    ceil-halves; the mosaic at each step is approx-dims + detail-dims)."""
    dims = []
    hh, ww = h, w
    for _ in range(level):
        hh, ww = (hh + 1) // 2, (ww + 1) // 2
        dims.append((hh, ww))
    ph, pw = dims[-1] if dims else (h, w)
    for dh, dw in dims[::-1]:
        ph, pw = ph + dh, pw + dw
    return (ph, pw) if level else (h, w)
