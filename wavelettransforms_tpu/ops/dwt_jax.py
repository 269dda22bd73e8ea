"""JAX/XLA DWT engine — the TPU-native compute path.

Semantics: identical to ``dwt_numpy`` (the pywt-parity oracle); every function
here is jittable with static shapes and batches over all leading axes.

Two execution strategies, chosen per transform axis length:

* **Matmul path** (axis length <= ``MATMUL_MAX_N``): the 1-D DWT along a tiny
  axis is a dense linear operator (same cached matrices as the oracle), so the
  batched transform is one ``einsum`` — it lands on the MXU with the channel
  batch on the contracting-free dims.  This is the hot layout for conv-weight
  tensors (1x1..7x7 kernels batched over out_ch*in_ch up to 512*512): the
  spatial axes are the *serial* part and channels fill the vector lanes,
  deliberately the opposite of an image-DWT layout (SURVEY.md §7 "tiny spatial
  dims").
* **Conv path** (longer axes): periodic/symmetric extension by static slicing
  + ``lax.conv_general_dilated`` with stride 2 (analysis) or interleaved
  upsample + stride-1 conv (synthesis).  XLA fuses the extension concat into
  the convolution; this is the bandwidth-bound path for large weight matrices
  (4096x4096 MLP tensors etc.), further accelerated by the Pallas kernels in
  ``ops/pallas``.

Reference parity: replaces pywt.wavedec2/waverec2/coeffs_to_array usage at
/root/reference/ResNet/dwt_pruning.py:67-77.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..wavelets import Wavelet, get_wavelet
from . import dwt_numpy as _ref

# Above this axis length the dense-operator matmul path stops being profitable
# and the conv path takes over.
MATMUL_MAX_N = 64


def _as_wavelet(wavelet) -> Wavelet:
    return wavelet if isinstance(wavelet, Wavelet) else get_wavelet(wavelet)


# ---------------------------------------------------------------------------
# 1-D building blocks along the LAST axis
# ---------------------------------------------------------------------------

# Contraction length at or below which the dense-operator apply is unrolled
# into elementwise multiply-adds instead of an einsum.  The gemm form's
# accumulation REASSOCIATES with the collapsed batch extent (XLA CPU gemm
# M-blocking: a zero-padded or differently-batched run of the same slice
# drifts by 1 ulp in the M-remainder rows), while the unrolled form's
# per-element numerics are identical for ANY batch shape — the pad-and-mask
# channel-sharding fallback (parallel/gang._gang_sharding) relies on this
# for bit-exactness vs the unsharded encode.  Conv kernels (1x1..8x8
# spatial) all land here; larger tiny-axis tensors keep the einsum.
_UNROLL_MAX_K = 8


def _apply_operator_rows(x, A_np: np.ndarray):
    """out[..., c] = sum_n A[c, n] * x[..., n] with STATIC filter constants
    and a fixed left-to-right add chain per output — batch-shape-invariant
    (see _UNROLL_MAX_K).  Zero taps (the operators are banded) are skipped."""
    cols = []
    zero = None
    for c in range(A_np.shape[0]):
        acc = None
        for nn in range(A_np.shape[1]):
            v = float(A_np[c, nn])
            if v == 0.0:
                continue
            t = x[..., nn] * v
            acc = t if acc is None else acc + t
        if acc is None:
            if zero is None:
                zero = jnp.zeros(x.shape[:-1], x.dtype)
            acc = zero
        cols.append(acc)
    return jnp.stack(cols, axis=-1)


def _dwt_last_matmul(x, w: Wavelet, mode: str):
    n = x.shape[-1]
    A_lo, A_hi = _ref._analysis_matrices(n, w.name, mode)
    A_np = np.concatenate([A_lo, A_hi], axis=0)
    out = A_lo.shape[0]
    if n <= _UNROLL_MAX_K:
        y = _apply_operator_rows(x, A_np)
    else:
        A = jnp.asarray(A_np, dtype=x.dtype)
        y = jnp.einsum("...n,kn->...k", x, A,
                       precision=lax.Precision.HIGHEST)
    return y[..., :out], y[..., out:]


def _idwt_last_matmul(cA, cD, w: Wavelet, mode: str):
    n = cA.shape[-1]
    S_lo, S_hi = _ref._synthesis_matrices(n, w.name, mode)
    S_np = np.concatenate([S_lo, S_hi], axis=1)
    c = jnp.concatenate([cA, cD], axis=-1)
    if 2 * n <= _UNROLL_MAX_K:
        return _apply_operator_rows(c, S_np)
    S = jnp.asarray(S_np, dtype=cA.dtype)
    return jnp.einsum("...k,nk->...n", c, S,
                      precision=lax.Precision.HIGHEST)


def _conv1d_last(x, filt, stride: int):
    """Batched 1-D correlation along the last axis (VALID padding).

    out[..., k] = sum_j filt[j] * x[..., k*stride + j]
    """
    batch_shape = x.shape[:-1]
    n = x.shape[-1]
    xr = x.reshape((-1, 1, n))  # (N, C=1, W)
    f = filt.reshape((1, 1, -1))  # (O, I, W)
    y = lax.conv_general_dilated(
        xr, f, window_strides=(stride,), padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
        precision=lax.Precision.HIGHEST,  # full f32 on the TPU MXU
    )
    return y.reshape(batch_shape + (y.shape[-1],))


def _dwt_last_conv(x, w: Wavelet, mode: str):
    n = x.shape[-1]
    F = w.dec_len
    dtype = x.dtype
    dec_lo = jnp.asarray(w.dec_lo[::-1].copy(), dtype=dtype)
    dec_hi = jnp.asarray(w.dec_hi[::-1].copy(), dtype=dtype)
    if mode == "periodization":
        if n % 2:
            x = jnp.concatenate([x, x[..., -1:]], axis=-1)
            n += 1
        off = F // 2
        left = F - 1 - off
        # y[k] = sum_j dec[j] x[(2k + off - j) mod n]
        # extended signal xe[i] = x[(i - left) mod n], i in [0, n + F - 2]
        parts = []
        rem = left
        while rem > 0:  # wrap as many times as needed when F > n
            take = min(rem, n)
            parts.append(x[..., n - take:])
            rem -= take
        parts.append(x)
        rem = off
        while rem > 0:
            take = min(rem, n)
            parts.append(x[..., :take])
            rem -= take
        xe = jnp.concatenate(parts, axis=-1)[..., : n + F - 1]
        return (
            _conv1d_last(xe, dec_lo, 2),
            _conv1d_last(xe, dec_hi, 2),
        )
    else:
        pad = F - 1
        idx = _ref._extension_indices(n, pad, mode)
        gathered = jnp.where(
            jnp.asarray(idx)[None] >= 0, 1.0, 0.0
        ).astype(dtype) * jnp.take(x, jnp.asarray(np.maximum(idx, 0)), axis=-1)
        # y[k] = sum_j dec[j] ext[2k + 1 - j + pad]
        #      = sum_j dec_rev[j] ext[2k + 2 - F + pad + j]; with pad = F - 1
        #      = sum_j dec_rev[j] ext[2k + 1 + j] -> drop first ext sample.
        xe = gathered[..., 1:]
        return (
            _conv1d_last(xe, dec_lo, 2),
            _conv1d_last(xe, dec_hi, 2),
        )


def _idwt_last_conv(cA, cD, w: Wavelet, mode: str):
    n = cA.shape[-1]
    F = w.rec_len
    dtype = cA.dtype
    # synthesis correlation filters: reversed-reversed = original rec filters
    # x[t] = sum_j w_rev[j] * ue[t + j] with w_rev = rec[::-1]
    rec_lo = jnp.asarray(w.rec_lo[::-1].copy(), dtype=dtype)
    rec_hi = jnp.asarray(w.rec_hi[::-1].copy(), dtype=dtype)
    # upsample by 2 (interleave with zeros)
    z = jnp.zeros_like(cA)
    ua = jnp.stack([cA, z], axis=-1).reshape(cA.shape[:-1] + (2 * n,))
    ud = jnp.stack([cD, z], axis=-1).reshape(cD.shape[:-1] + (2 * n,))
    if mode == "periodization":
        N = 2 * n
        off = F // 2
        # x[t] = sum_j w_rev[j] * u[(t + j - off) mod N]
        def extend(u):
            parts = []
            rem = off
            while rem > 0:
                take = min(rem, N)
                parts.append(u[..., N - take:])
                rem -= take
            parts.append(u)
            rem = F - 1 - off
            while rem > 0:
                take = min(rem, N)
                parts.append(u[..., :take])
                rem -= take
            return jnp.concatenate(parts, axis=-1)[..., : N + F - 1]

        return (
            _conv1d_last(extend(ua), rec_lo, 1)
            + _conv1d_last(extend(ud), rec_hi, 1)
        )
    else:
        # x[i] = sum_k a[k] rec_lo[i - 2k + F - 2]
        #      = sum_m u[m] rec_lo[i - m + F - 2]
        #      = sum_j rec_rev[j] u[i + j - ... ]: valid conv after trimming.
        # Standard result length: 2n - F + 2; zero-pad u by F-2 on the left?
        # i - m + F - 2 = F - 1 - j  =>  m = i + j - 1; so
        # x[i] = sum_j rec_rev_shift... Use full conv then slice:
        def full_corr(u, f):
            pad = F - 1
            up = jnp.pad(u, [(0, 0)] * (u.ndim - 1) + [(pad, pad)])
            return _conv1d_last(up, f, 1)
        y = full_corr(ua, rec_lo) + full_corr(ud, rec_hi)
        # full correlation length 2n + F - 1; the valid synthesis part
        # x[i] for i = 0..2n-F+1 corresponds to offset F - 2 + 1 ... derive:
        # full[t] = sum_j rec_rev[j] up[t + j] = sum_j rec_rev[j] u[t + j - pad]
        #         = sum_m u[m] rec[F - 1 - (m - t + pad)] = sum_m u[m] rec[t - m]
        # want x[i] = sum_m u[m] rec[i - m + F - 2]  =>  t = i + F - 2.
        return y[..., F - 2: F - 2 + (2 * n - F + 2)]


def dwt_last(x, wavelet, mode: str = "periodization"):
    """Single-level DWT along the last axis -> (cA, cD)."""
    w = _as_wavelet(wavelet)
    if x.shape[-1] <= MATMUL_MAX_N:
        return _dwt_last_matmul(x, w, mode)
    return _dwt_last_conv(x, w, mode)


def idwt_last(cA, cD, wavelet, mode: str = "periodization"):
    w = _as_wavelet(wavelet)
    if cA.shape[-1] * 2 <= MATMUL_MAX_N:
        return _idwt_last_matmul(cA, cD, w, mode)
    return _idwt_last_conv(cA, cD, w, mode)


# ---------------------------------------------------------------------------
# Axis-general wrappers
# ---------------------------------------------------------------------------

def dwt(x, wavelet, mode: str = "periodization", axis: int = -1):
    axis = axis % x.ndim
    if axis == x.ndim - 1:
        return dwt_last(x, wavelet, mode)
    xm = jnp.moveaxis(x, axis, -1)
    cA, cD = dwt_last(xm, wavelet, mode)
    return jnp.moveaxis(cA, -1, axis), jnp.moveaxis(cD, -1, axis)


def idwt(cA, cD, wavelet, mode: str = "periodization", axis: int = -1):
    axis = axis % cA.ndim
    if axis == cA.ndim - 1:
        return idwt_last(cA, cD, wavelet, mode)
    am = jnp.moveaxis(cA, axis, -1)
    dm = jnp.moveaxis(cD, axis, -1)
    y = idwt_last(am, dm, wavelet, mode)
    return jnp.moveaxis(y, -1, axis)


def dwt2(x, wavelet, mode: str = "periodization", axes=(-2, -1)):
    """(cA, (cH, cV, cD)); cH = detail along axes[0] (pywt order)."""
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


def wavedec2(x, wavelet, level: int, mode: str = "periodization", axes=(-2, -1)):
    """Multi-level 2-D DWT; level is static (unrolled at trace time).
    level == 0 -> [x] (the reference's clamped-level identity path)."""
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
        for ax in axes:
            want = cH.shape[ax]
            if a.shape[ax] > want:
                a = lax.slice_in_dim(a, 0, want, axis=ax % a.ndim)
        a = idwt2((a, details), wavelet, mode, axes)
    return a


# ---------------------------------------------------------------------------
# Packed mosaic (pywt.coeffs_to_array semantics, jittable)
# ---------------------------------------------------------------------------

def coeffs_to_array(coeffs, axes=(-2, -1), padding: float = 0.0):
    """Pack wavedec2 coefficients to one mosaic along ``axes``; zero padding
    where blocks don't tile (matches oracle/pywt).  Returns (arr, slices)."""
    ax0, ax1 = axes
    ndim = coeffs[0].ndim
    ax0 %= ndim
    ax1 %= ndim
    simple = (ax0, ax1) == (ndim - 2, ndim - 1)
    move = (lambda t: t) if simple else (lambda t: jnp.moveaxis(t, (ax0, ax1), (-2, -1)))
    unmove = (lambda t: t) if simple else (lambda t: jnp.moveaxis(t, (-2, -1), (ax0, ax1)))

    def pad_to(t, h, ww):
        ph = h - t.shape[-2]
        pw = ww - t.shape[-1]
        if ph or pw:
            cfg = [(0, 0)] * (t.ndim - 2) + [(0, ph), (0, pw)]
            t = jnp.pad(t, cfg, constant_values=padding)
        return t

    arr = move(coeffs[0])
    slices = [(slice(0, arr.shape[-2]), slice(0, arr.shape[-1]))]
    levels = []
    for details in coeffs[1:]:
        cH, cV, cD = (move(d) for d in details)
        h0, w0 = arr.shape[-2:]
        hh, hw = cH.shape[-2:]
        vh, vw = cV.shape[-2:]
        top = jnp.concatenate([arr, pad_to(cV, h0, vw)], axis=-1)
        bot = jnp.concatenate(
            [pad_to(cH, hh, w0), pad_to(cD, hh, vw)], axis=-1)
        arr = jnp.concatenate([top, bot], axis=-2)
        levels.append({
            "ad": (slice(0, vh), slice(w0, w0 + vw)),
            "da": (slice(h0, h0 + hh), slice(0, hw)),
            "dd": (slice(h0, h0 + cD.shape[-2]), slice(w0, w0 + cD.shape[-1])),
        })
    return unmove(arr), [slices[0]] + levels


def array_to_coeffs(arr, slices, axes=(-2, -1)):
    ax0, ax1 = axes
    ndim = arr.ndim
    ax0 %= ndim
    ax1 %= ndim

    def cut(sl):
        index = [slice(None)] * ndim
        index[ax0] = sl[0]
        index[ax1] = sl[1]
        return arr[tuple(index)]

    out = [cut(slices[0])]
    for level in slices[1:]:
        out.append((cut(level["da"]), cut(level["ad"]), cut(level["dd"])))
    return out


# ---------------------------------------------------------------------------
# Fused convenience transforms
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("wavelet", "level", "mode"))
def wavedec2_packed(x, wavelet: str, level: int, mode: str = "periodization"):
    """x -> packed coefficient mosaic along the last two axes (jitted)."""
    arr, _ = coeffs_to_array(wavedec2(x, wavelet, level, mode))
    return arr


def packed_slices(h: int, w: int, wavelet: str, level: int,
                  mode: str = "periodization"):
    """Static slice structure for a given input tile shape (trace-free)."""
    x = np.zeros((h, w))
    coeffs = _ref.wavedec2(x, wavelet, level, mode)
    _, slices = _ref.coeffs_to_array(coeffs)
    return slices


def subband_shapes(h: int, w: int, wavelet, level: int,
                   mode: str = "periodization"):
    """Per-level detail subband shapes: entry i is the (h, w) of the detail
    bands after i+1 analysis steps (finest first, coarsest last)."""
    wv = _as_wavelet(wavelet)
    F = wv.dec_len

    def down(n):
        return -(-n // 2) if mode == "periodization" else (n + F - 1) // 2

    out = []
    hh, ww = h, w
    for _ in range(level):
        hh, ww = down(hh), down(ww)
        out.append((hh, ww))
    return out


def mosaic_pad_count(h: int, w: int, wavelet, level: int,
                     mode: str = "periodization") -> int:
    """Zero elements ``coeffs_to_array`` padding adds per 2-D slice when
    subband blocks don't tile the mosaic (pywt semantics).  The reference's
    global percentile runs over the PADDED mosaic
    (/root/reference/ResNet/dwt_pruning.py:67-73), so kernel paths that
    keep coefficients as subbands must add this count to the percentile
    rank to stay bit-compatible.  Static shape recursion — no data."""
    detail = subband_shapes(h, w, wavelet, level, mode)
    if not detail:
        return 0
    ah, aw = detail[-1]
    coeff = ah * aw  # approximation band
    for dh, dw in reversed(detail):  # coarse -> fine packing order
        coeff += 3 * dh * dw
        ah += dh
        aw += dw
    return ah * aw - coeff


@functools.partial(jax.jit, static_argnames=("wavelet", "level", "mode", "h", "w"))
def waverec2_packed(arr, wavelet: str, level: int, h: int, w: int,
                    mode: str = "periodization"):
    """Packed mosaic -> reconstruction cropped to (h, w) (jitted)."""
    slices = packed_slices(h, w, wavelet, level, mode)
    coeffs = array_to_coeffs(arr, slices)
    y = waverec2(coeffs, wavelet, mode)
    return y[..., :h, :w]
