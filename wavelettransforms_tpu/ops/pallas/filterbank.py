"""Pallas TPU filter-bank kernels — the hand-written transform engine.

The reference delegates its hot loop to PyWavelets' C convolution core
(/root/reference/ResNet/dwt_pruning.py:67-77); this is the TPU-native
replacement (SURVEY.md §2.4): fused separable 2-D analysis/synthesis for
``mode='periodization'``, one HBM read + one HBM write per level.

Design (per grid step = one full-width row band of one batch element):

  * the input stays in HBM (``pl.ANY``); the kernel DMAs the band plus
    ``F/2-1`` halo rows (top/bottom, circular wrap — periodization) into a
    REVOLVING two-slot VMEM buffer: step n's compute overlaps step n+1's
    fetch, and output writes are pipelined by pallas' own out BlockSpecs;
  * column (sublane) pass: deinterleave even/odd rows via a sublane
    reshape, then F shifted multiply-adds (contiguous slices, VPU);
  * row (lane) pass: banded block MXU matmuls — a 128-in/64-out-per-subband
    fused analysis operator (manual bf16x3 hi/lo-split dots by default, 6-pass
    f32 HIGHEST via WTT_MXU_PRECISION=highest; native one-pass bf16 dots on
    the bfloat16 path) — measured ~3.5x faster than in-VMEM transposes;
  * synthesis fuses an optional hard threshold into the coefficient loads
    (|c| < thr -> 0) so the prune pipeline never materializes thresholded
    coefficients in HBM;
  * non-periodization modes (symmetric / reflect / zero / periodic /
    constant) route through ``*_pallas_mode``: a cheap jnp.pad edge
    extension feeds mode-agnostic VALID-mode kernels — all boundary logic
    stays out of the kernels (pywt valid output sizes).

Measured on a v5e chip (4096^2 bior4.4, median-of-5 slope-timed runs, r5):
roundtrip 0.59 ms f32 (~455 GB/s, ~28x the XLA conv path) / 0.43 ms bf16
(MXU column pass straight from the packed band); symmetric-mode roundtrip
0.89 ms via the direct edge-extension kernel (no materialized jnp.pad).
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...wavelets import Wavelet, get_wavelet

# Flip to True (e.g. in tests) to run kernels in interpreter mode off-TPU.
INTERPRET = False

# f32 MXU strategy for the banded filter-bank matmuls (initialized from
# WTT_MXU_PRECISION=bf16x3|highest at import).  HIGHEST = XLA's 6-pass bf16
# emulation (safest).  bf16x3 = manual hi/lo split, 3 native bf16 dots with
# f32 accumulation (xh@Th + xl@Th + xh@Tl, dropping the ~2^-16-relative
# xl@Tl term) — half the MXU passes.  Mosaic does not lower Precision.HIGH,
# hence the manual split.  To change at runtime use set_mxu_precision() —
# mutating the env var after import is ignored (the flag is baked into
# traced programs).
_MXU_BF16X3 = os.environ.get("WTT_MXU_PRECISION", "bf16x3") != "highest"


def set_mxu_precision(strategy: str) -> None:
    """Switch the f32 MXU strategy ('bf16x3' | 'highest') at runtime.

    Clears this module's jit caches AND the framework's whole-checkpoint
    prune entry (prune.dwt_prune._gang_encode) so the next call re-traces
    with the new strategy.  Programs jitted OUTSIDE the framework that
    already inlined the kernels (a caller's own jax.jit around a prune
    sweep) keep their compiled precision — call this before building such
    programs."""
    if strategy not in ("bf16x3", "highest"):
        raise ValueError(f"unknown MXU precision strategy {strategy!r}")
    global _MXU_BF16X3
    _MXU_BF16X3 = strategy != "highest"
    for fn in (dwt2_level_pallas, idwt_rows_pallas, idwt2_level_pallas,
               dwt2_level_pallas_mode, idwt2_level_pallas_mode):
        fn.clear_cache()
    from ...prune.dwt_prune import _gang_encode

    _gang_encode.clear_cache()


def _split_bf16(x):
    """hi/lo bf16 split of an f32 array: x ≈ hi + lo with hi = bf16(x)."""
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _dot(a, b):
    """Native one-pass MXU dot with f32 accumulation."""
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def _as_wavelet(wavelet) -> Wavelet:
    return wavelet if isinstance(wavelet, Wavelet) else get_wavelet(wavelet)


def _deinterleaved_pass(band, filt_rev, out_rows: int, shift: int = 0):
    """out[k, :] = sum_j filt_rev[j] * band[2k + j + shift, :], k < out_rows.

    ``shift`` (static) absorbs halo padding added for DMA alignment.
    Implemented as F contiguous shifted adds on the even/odd row planes (no
    strided access).
    """
    rows, cols = band.shape
    half = rows // 2
    de = band.reshape(half, 2, cols)
    planes = (de[:, 0, :], de[:, 1, :])
    acc = None
    for j, c in enumerate(filt_rev):
        if c == 0.0:
            continue  # bior/rbio filters carry exact-zero taps (VPU-bound)
        src = planes[(j + shift) % 2]
        start = (j + shift) // 2
        piece = jax.lax.slice_in_dim(src, start, start + out_rows, axis=0)
        term = piece * c
        acc = term if acc is None else acc + term
    if acc is None:
        acc = jnp.zeros((out_rows, cols), band.dtype)
    return acc


def _col_pass(band, lo_rev, hi_rev, out_rows: int, shift: int = 0):
    return (_deinterleaved_pass(band, lo_rev, out_rows, shift),
            _deinterleaved_pass(band, hi_rev, out_rows, shift))


def _row_pass(x, lo_rev, hi_rev, halo: int):
    """Periodization transform along the LANE axis via lane-circular concat +
    transpose + deinterleaved column pass + transpose back (fallback path
    for widths not divisible by the MXU block)."""
    rows, cols = x.shape
    out_cols = cols // 2
    if halo:
        ext = jnp.concatenate(
            [x[:, cols - halo:], x, x[:, :halo]], axis=1)
    else:
        ext = x
    t = ext.T  # (cols + 2*halo, rows)
    lo = _deinterleaved_pass(t, lo_rev, out_cols).T
    hi = _deinterleaved_pass(t, hi_rev, out_cols).T
    return lo, hi


# MXU block sizes.  Analysis row-pass: each 64-wide output column block (x2
# subbands) consumes a 128(+2*halo)-wide input slice through a banded
# analysis matrix — dense little matmuls instead of lane shuffles/transposes.
# 128-in blocks beat 256-in: the contraction dim rounds to 2 MXU tiles
# instead of 3 (measured ~9% faster end to end, identical accuracy).
_MXU_OUT = 128   # synthesis out-block width
_AIN = 128       # analysis in-block width
_AOUT = _AIN // 2


def _row_analysis_matrices(w: Wavelet):
    """Banded per-block analysis operators T_lo/T_hi, shape
    (_AIN + 2*halo, 2*_AOUT): out[:, _AOUT*j + c] = ext_block_j @ T[:, c]."""
    F = w.dec_len
    off = F // 2
    hp = F // 2 - 1
    T = np.zeros((_AIN + 2 * hp, 2 * _AOUT), np.float32)
    for c in range(_AOUT):
        for jp in range(F):
            r = 2 * c + off + hp - jp
            T[r, c] += w.dec_lo[jp]
            T[r, _AOUT + c] += w.dec_hi[jp]
    return T


def _col_analysis_matrix(w: Wavelet, tm: int, rows: int, halo: int,
                         hp: int):
    """MXU column-pass operator (bf16 lossy path): res = A @ band computes
    BOTH subbands' column pass straight from the (16,128)-tiled bf16 band —
    no band upcast, no VPU shifted adds (the kernels are VPU-bound;
    measured 0.63 -> ~0.4 ms on the bf16 roundtrip).  A is (tm, rows):
    out rows [0, tm/2) = lo, [tm/2, tm) = hi; band row of tap j for output
    k is 2k + j + (hp - halo)."""
    F = w.dec_len
    A = np.zeros((tm, rows), np.float32)
    sh = hp - halo
    lo_rev = w.dec_lo[::-1]
    hi_rev = w.dec_hi[::-1]
    for k in range(tm // 2):
        for j in range(F):
            r = 2 * k + j + sh
            A[k, r] += lo_rev[j]
            A[tm // 2 + k, r] += hi_rev[j]
    return A


def _row_pass_mxu_prep(x, T, hp: int, bf16: bool = False):
    """Lane-axis analysis as banded block matmuls (MXU).  ``T`` is the fused
    (_AIN + 2*hp, 2*_AOUT) operator with lo taps in columns [:_AOUT] and hi
    taps in [_AOUT:] — one dot per block computes both subbands.

    Returns ``blk(j0) -> (rows, 2*_AOUT)`` (lo block | hi block): callers
    write each block straight to its output ref, keeping only one block
    live at a time (bulk concats force the register allocator to spill —
    measured 48M spill slots on a 512-row synthesis band).

    ``bf16`` uses native single-pass bf16 MXU dots (f32 accumulation) —
    ~6x fewer MXU passes than f32 HIGHEST; only for the bf16 lossy path."""
    rows, cols = x.shape
    if bf16:
        x = x.astype(jnp.bfloat16)
        T = T.astype(jnp.bfloat16)
    if hp:
        ext = jnp.concatenate([x[:, cols - hp:], x, x[:, :hp]], axis=1)
    else:
        ext = x
    use_x3 = _MXU_BF16X3 and not bf16
    if use_x3:
        eh, el = _split_bf16(ext)
        Th, Tl = _split_bf16(T)

    def blk(j0):
        sl = lambda a: jax.lax.slice_in_dim(
            a, _AIN * j0, _AIN * j0 + _AIN + 2 * hp, axis=1)
        if use_x3:
            return _dot(sl(eh), Th) + _dot(sl(el), Th) + _dot(sl(eh), Tl)
        if bf16:
            # one native bf16 MXU pass (Mosaic requires a 32-bit
            # accumulator, so emit f32 and cast at the store)
            return _dot(sl(ext), T)
        return jnp.dot(sl(ext), T, precision=jax.lax.Precision.HIGHEST,
                       preferred_element_type=jnp.float32)

    return blk, cols // _AIN


def _sublane(dtype) -> int:
    """Sublane tile height per dtype ((8,128) f32 / (16,128) bf16)."""
    return 16 if jnp.dtype(dtype) == jnp.bfloat16 else 8


def _aligned_halo(halo: int, sub: int = 8) -> int:
    """HBM DMA slices must be (sub, 128)-tile aligned: round the halo row
    count up to a multiple of the sublane tile (the surplus is absorbed by a
    static shift in the filter-tap slicing)."""
    return ((halo + sub - 1) // sub) * sub if halo else 0


def _analysis_kernel(x_hbm, ll_ref, hl_ref, lh_ref, hh_ref, band, sem, *,
                     tm: int, h: int, w: int, halo: int,
                     lo_rev, hi_rev, tlo_ref=None, sub: int = 8,
                     acol_ref=None):
    """Input bands are double-buffered: step n's compute overlaps step n+1's
    HBM->VMEM DMA (``band`` has a leading slot axis of 2); output writes are
    pipelined by pallas itself via the out BlockSpecs."""
    b = pl.program_id(0)
    i = pl.program_id(1)
    nb = pl.num_programs(1)
    n = b * nb + i
    total = pl.num_programs(0) * nb
    hp = _aligned_halo(halo, sub)

    def start_fetch(step):
        """Issue the three copies for flat step ``step`` into slot step%2;
        returns the descriptors (reconstructible for wait)."""
        slot = jax.lax.rem(step, jnp.int32(2))
        bb = step // nb
        r0 = jax.lax.rem(step, jnp.int32(nb)) * tm

        def copy(dst_row, src_row, nrows, k):
            return pltpu.make_async_copy(
                x_hbm.at[bb, pl.ds(src_row, nrows), :],
                band.at[slot, pl.ds(dst_row, nrows), :],
                sem.at[slot, k],
            )

        cps = []
        if hp:
            top = pl.multiple_of(jax.lax.rem(r0 - hp + h, jnp.int32(h)), sub)
            bot = pl.multiple_of(jax.lax.rem(r0 + tm, jnp.int32(h)), sub)
            cps.append(copy(0, top, hp, 0))
            cps.append(copy(hp + tm, bot, hp, 1))
        cps.append(copy(hp, pl.multiple_of(r0, sub), tm, 2))
        return cps

    @pl.when(n == 0)
    def _():
        for cp in start_fetch(n):
            cp.start()

    @pl.when(n + 1 < total)
    def _():
        for cp in start_fetch(n + 1):
            cp.start()

    for cp in start_fetch(n):
        cp.wait()

    # NOTE: a fully-native bf16 VPU col pass (no astype) was tried and
    # measured 4x SLOWER (2.55 ms roundtrip vs 0.63): Mosaic's bf16
    # elementwise / sublane-reshape codegen is far worse than one upcast +
    # f32 VPU work.  The bf16 path instead runs the col pass on the MXU
    # (``acol_ref``), straight from the packed band.
    slot_b = band[jax.lax.rem(n, jnp.int32(2))]
    if acol_ref is not None:
        # one native bf16 pass: a hi/lo tap split was tried (+0.08 ms) and
        # left the error essentially unchanged — the input/coefficient
        # bf16 rounding dominates the lossy path's budget, not the taps
        res = jnp.dot(acol_ref[...], slot_b,
                      preferred_element_type=jnp.float32)
        a0 = jax.lax.slice_in_dim(res, 0, tm // 2, axis=0)
        d0 = jax.lax.slice_in_dim(res, tm // 2, tm, axis=0)
    else:
        x = slot_b.astype(jnp.float32)
        a0, d0 = _col_pass(x, lo_rev, hi_rev, tm // 2, shift=hp - halo)
    # pywt naming: hl = 'da' (detail along rows), lh = 'ad' (detail cols)
    if tlo_ref is not None:
        T = tlo_ref[...]
        bf16 = jnp.dtype(ll_ref.dtype) == jnp.bfloat16
        blk_a, nblk = _row_pass_mxu_prep(a0, T, halo, bf16)
        blk_d, _ = _row_pass_mxu_prep(d0, T, halo, bf16)
        # BULK concat + whole-ref writes: at the periodization band sizes
        # (tm <= 256) the registers fit and Mosaic schedules the full-width
        # vector stores ~20% faster than 64-wide block stores (the
        # block-at-a-time form exists for the 512-row valid-mode synthesis
        # bands, where bulk concats spill — measured 48M spill slots).
        def bulk(blk):
            los, his = [], []
            for j0 in range(nblk):
                both = blk(j0)
                los.append(both[:, :_AOUT])
                his.append(both[:, _AOUT:])
            return (jnp.concatenate(los, axis=1),
                    jnp.concatenate(his, axis=1))

        ll, lh = bulk(blk_a)
        hl, hh = bulk(blk_d)
        ll_ref[...] = ll.astype(ll_ref.dtype)
        lh_ref[...] = lh.astype(lh_ref.dtype)
        hl_ref[...] = hl.astype(hl_ref.dtype)
        hh_ref[...] = hh.astype(hh_ref.dtype)
    else:
        ll, lh = _row_pass(a0, lo_rev, hi_rev, halo)
        hl, hh = _row_pass(d0, lo_rev, hi_rev, halo)
        ll_ref[...] = ll.astype(ll_ref.dtype)
        hl_ref[...] = hl.astype(hl_ref.dtype)
        lh_ref[...] = lh.astype(lh_ref.dtype)
        hh_ref[...] = hh.astype(hh_ref.dtype)


@functools.partial(jax.jit, static_argnames=("wavelet", "tm", "interpret",
                                             "out_dtype"))
def dwt2_level_pallas(x, wavelet: str, tm: int | None = None,
                      interpret: bool | None = None, out_dtype=None):
    """Single-level 2-D periodization DWT of (B, H, W) float32 or bfloat16.

    Returns (ll, hl, lh, hh), each (B, H/2, W/2) in the input dtype:
      hl = detail along rows (pywt 'da' / cH), lh = detail along cols ('ad').
    H must be a multiple of ``tm``; H, W even; halo (= dec_len/2-1) < tm.
    bfloat16 inputs halve HBM traffic (lossy paths); compute is f32.

    ``out_dtype`` overrides the coefficient dtype (mixed-precision
    pipelines: e.g. bf16 input -> f32 coefficients); the MXU pass count
    follows the OUTPUT dtype (bf16 out = one native bf16 dot).

    ``tm=None`` picks 256-row bands when H allows (fewer, larger input DMAs:
    measured 431 -> 447 GB/s on the 4096^2 bior4.4 roundtrip), else 128.
    """
    w = _as_wavelet(wavelet)
    interpret = INTERPRET if interpret is None else interpret
    B, H, W = x.shape
    F = w.dec_len
    halo = F // 2 - 1
    if tm is None:
        tm = 256 if H % 256 == 0 else 128
    tm = min(tm, H)
    assert H % tm == 0 and H % 2 == 0 and W % 2 == 0 and halo < tm, (
        H, W, tm, halo)
    lo_rev = tuple(float(v) for v in w.dec_lo[::-1])
    hi_rev = tuple(float(v) for v in w.dec_hi[::-1])

    sub = _sublane(x.dtype)
    grid = (B, H // tm)
    out_shape = [jax.ShapeDtypeStruct((B, H // 2, W // 2),
                                      out_dtype or x.dtype)] * 4
    out_spec = pl.BlockSpec((1, tm // 2, W // 2), lambda b, i: (b, i, 0),
                            memory_space=pltpu.VMEM)

    use_mxu = W % _AIN == 0
    # bf16 io: column pass on the MXU straight from the packed band (the
    # kernels are VPU-bound; this removes the band upcast + shifted adds).
    # The analogous f32 variant (bf16x3 column dots + band hi/lo split)
    # was tried and measured SLOWER (0.675 vs 0.638 ms roundtrip): the
    # full-band split packs cost more VPU than the shifted adds they
    # replace, so f32 keeps the exact VPU column pass.
    use_col_mxu = (use_mxu and jnp.dtype(x.dtype) == jnp.bfloat16
                   and jnp.dtype(out_dtype or x.dtype) == jnp.bfloat16)

    if use_mxu:
        T_np = _row_analysis_matrices(w)
        extra_specs, extra_args = [], ()
        if use_col_mxu:
            A_np = _col_analysis_matrix(w, tm, tm + 2 * _aligned_halo(
                halo, sub), halo, _aligned_halo(halo, sub))
            extra_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)]
            extra_args = (jnp.asarray(A_np, jnp.bfloat16),)

        def wrapped(x_hbm, tref, *rest):
            if use_col_mxu:
                (aref, ll, hl, lh, hh, band, sem) = rest
            else:
                aref = None
                (ll, hl, lh, hh, band, sem) = rest
            _analysis_kernel(
                x_hbm,
                ll.at[0], hl.at[0], lh.at[0], hh.at[0],
                band, sem, tm=tm, h=H, w=W, halo=halo,
                lo_rev=lo_rev, hi_rev=hi_rev, tlo_ref=tref, sub=sub,
                acol_ref=aref)

        in_specs = ([pl.BlockSpec(memory_space=pltpu.ANY),
                     pl.BlockSpec(memory_space=pltpu.VMEM)] + extra_specs)
        args = (x, jnp.asarray(T_np)) + extra_args
    else:
        def wrapped(x_hbm, ll, hl, lh, hh, band, sem):
            _analysis_kernel(
                x_hbm,
                ll.at[0], hl.at[0], lh.at[0], hh.at[0],
                band, sem, tm=tm, h=H, w=W, halo=halo,
                lo_rev=lo_rev, hi_rev=hi_rev, sub=sub)

        in_specs = [pl.BlockSpec(memory_space=pltpu.ANY)]
        args = (x,)

    ll, hl, lh, hh = pl.pallas_call(
        wrapped,
        grid=grid,
        in_specs=in_specs,
        out_specs=[out_spec] * 4,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((2, tm + 2 * _aligned_halo(halo, sub), W), x.dtype),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20),
        interpret=interpret,
    )(*args)
    return ll, hl, lh, hh


# ---------------------------------------------------------------------------
# Synthesis
# ---------------------------------------------------------------------------

def _upsample_rows(a):
    rows, cols = a.shape
    z = jnp.zeros_like(a)
    return jnp.stack([a, z], axis=1).reshape(2 * rows, cols)


def _synth_pass_rows(ua, ud, lo_rev_sym, hi_rev_sym, out_rows: int,
                     start: int = 0):
    """x[t] = sum_j rec_rev[j] * u[t + j + start] over upsampled halo rows."""
    F = len(lo_rev_sym)
    acc = None
    for j in range(F):
        s = j + start
        term = None
        if lo_rev_sym[j] != 0.0:  # skip exact-zero taps (VPU-bound)
            term = jax.lax.slice_in_dim(ua, s, s + out_rows,
                                        axis=0) * lo_rev_sym[j]
        if hi_rev_sym[j] != 0.0:
            pd = jax.lax.slice_in_dim(ud, s, s + out_rows,
                                      axis=0) * hi_rev_sym[j]
            term = pd if term is None else term + pd
        if term is not None:
            acc = term if acc is None else acc + term
    return acc


def _synthesis_kernel(a_hbm, d_hbm, out_ref, band_a, band_d, sem, *,
                      tc: int, hc: int, wc: int, F: int,
                      lo_rev, hi_rev, axis_rows: bool):
    """One band of coefficient rows -> reconstructed rows (single axis).

    a/d: (B, HC, WC) coefficient arrays; out: (B, 2*HC, WC).
    Needs halo: output rows [2*tc*i, 2*tc*(i+1)) depend on u rows
    [n - off, n + F - 1 - off] -> coefficient rows floor offsets.
    """
    b = pl.program_id(0)
    i = pl.program_id(1)
    off = F // 2
    # coefficient-row halo: left ceil(off/2), right ceil((F-off)/2),
    # padded to the DMA tile alignment.
    hl = _aligned_halo((off + 1) // 2)
    hr = _aligned_halo((F - off) // 2)
    r0 = i * tc

    def fetch(hbm, buf, slot0):
        cps = []
        if hl:
            top = pl.multiple_of(jax.lax.rem(r0 - hl + hc, jnp.int32(hc)), 8)
            cps.append(pltpu.make_async_copy(
                hbm.at[b, pl.ds(top, hl), :], buf.at[pl.ds(0, hl), :],
                sem.at[slot0]))
        if hr:
            bot = pl.multiple_of(jax.lax.rem(r0 + tc, jnp.int32(hc)), 8)
            cps.append(pltpu.make_async_copy(
                hbm.at[b, pl.ds(bot, hr), :], buf.at[pl.ds(hl + tc, hr), :],
                sem.at[slot0 + 1]))
        cps.append(pltpu.make_async_copy(
            hbm.at[b, pl.ds(pl.multiple_of(r0, 8), tc), :],
            buf.at[pl.ds(hl, tc), :],
            sem.at[slot0 + 2]))
        for c in cps:
            c.start()
        return cps

    cps = fetch(a_hbm, band_a, 0) + fetch(d_hbm, band_d, 3)
    for c in cps:
        c.wait()

    ua = _upsample_rows(band_a[...])
    ud = _upsample_rows(band_d[...])
    # local u row index of global u row n: n - 2*(r0 - hl)
    # want x[n] = sum_j w_rev[j] * u[n + j - off]; first needed u for local
    # out row 0 (global n0 = 2*r0) is 2*r0 - off -> local = 2*hl - off >= 0.
    out = _synth_pass_rows(ua, ud, lo_rev, hi_rev, 2 * tc,
                           start=2 * hl - off)
    out_ref[...] = out


@functools.partial(jax.jit, static_argnames=("wavelet", "tc", "interpret"))
def idwt_rows_pallas(cA, cD, wavelet: str, tc: int = 128,
                     interpret: bool | None = None):
    """Periodization synthesis along the ROW axis of (B, HC, W) -> (B, 2HC, W)."""
    w = _as_wavelet(wavelet)
    interpret = INTERPRET if interpret is None else interpret
    B, HC, W = cA.shape
    F = w.rec_len
    tc = min(tc, HC)
    assert HC % tc == 0
    off = F // 2
    hl = _aligned_halo((off + 1) // 2)
    hr = _aligned_halo((F - off) // 2)
    assert hl <= HC and hr <= HC, "coefficient band too short for halo wrap"
    lo_rev = tuple(float(v) for v in w.rec_lo[::-1])
    hi_rev = tuple(float(v) for v in w.rec_hi[::-1])

    grid = (B, HC // tc)
    out_spec = pl.BlockSpec((1, 2 * tc, W), lambda b, i: (b, i, 0),
                            memory_space=pltpu.VMEM)

    def wrapped(a_hbm, d_hbm, out, band_a, band_d, sem):
        _synthesis_kernel(
            a_hbm, d_hbm, out.at[0], band_a, band_d, sem,
            tc=tc, hc=HC, wc=W, F=F, lo_rev=lo_rev, hi_rev=hi_rev,
            axis_rows=True)

    return pl.pallas_call(
        wrapped,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * 2,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((B, 2 * HC, W), cA.dtype),
        scratch_shapes=[
            pltpu.VMEM((tc + hl + hr, W), jnp.float32),
            pltpu.VMEM((tc + hl + hr, W), jnp.float32),
            pltpu.SemaphoreType.DMA((6,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20),
        interpret=interpret,
    )(cA, cD)


def _row_synthesis_matrices(w: Wavelet, hpc: int):
    """Banded per-block synthesis operators S_lo/S_hi for the lane axis:
    out[:, 128*j0 + c] = a_slice_j0 @ S_lo[:, c] + d_slice_j0 @ S_hi[:, c],
    with slices of width 64 + 2*hpc from the halo-extended coefficients.

    S[m', c] = rec_rev[2m' - 2*hpc - c + off] (when in range)."""
    F = w.rec_len
    off = F // 2
    rows = 64 + 2 * hpc
    S = np.zeros((2 * rows, _MXU_OUT), np.float32)
    lo_rev = w.rec_lo[::-1]
    hi_rev = w.rec_hi[::-1]
    for mp in range(rows):
        for c in range(_MXU_OUT):
            idx = 2 * mp - 2 * hpc - c + off
            if 0 <= idx < F:
                S[mp, c] += lo_rev[idx]
                S[rows + mp, c] += hi_rev[idx]
    return S


def _wsynth_mxu_prep(a, d, S, hpc: int, bf16: bool = False):
    """Lane-axis synthesis as banded block matmuls: (R, WC) x2 -> 128-wide
    out blocks.  ``S`` is the fused (2*(64+2*hpc), 128) operator (lo rows
    stacked over hi rows) — one dot of concat([a_slice, d_slice]) per block.
    ``bf16``: native single-pass bf16 dots for the lossy path.

    Returns ``(blk(j0), nblk)`` so the caller consumes one block at a time
    (register-pressure: see _row_pass_mxu_prep)."""
    rows, wc = a.shape
    if bf16:
        a = a.astype(jnp.bfloat16)
        d = d.astype(jnp.bfloat16)
        S = S.astype(jnp.bfloat16)
    a_ext = jnp.concatenate([a[:, wc - hpc:], a, a[:, :hpc]], axis=1)
    d_ext = jnp.concatenate([d[:, wc - hpc:], d, d[:, :hpc]], axis=1)
    use_x3 = _MXU_BF16X3 and not bf16
    if use_x3:
        ah, al = _split_bf16(a_ext)
        dh, dl = _split_bf16(d_ext)
        Sh, Sl = _split_bf16(S)
    width = 64 + 2 * hpc

    def blk(j0):
        def blk_of(aa, dd):
            sa = jax.lax.slice_in_dim(aa, 64 * j0, 64 * j0 + width, axis=1)
            sd = jax.lax.slice_in_dim(dd, 64 * j0, 64 * j0 + width, axis=1)
            return jnp.concatenate([sa, sd], axis=1)
        if use_x3:
            bh = blk_of(ah, dh)
            return _dot(bh, Sh) + _dot(blk_of(al, dl), Sh) + _dot(bh, Sl)
        if bf16:
            # one native bf16 MXU pass (f32 accumulator; cast at the store)
            return _dot(blk_of(a_ext, d_ext), S)
        return jnp.dot(blk_of(a_ext, d_ext), S,
                       precision=jax.lax.Precision.HIGHEST,
                       preferred_element_type=jnp.float32)

    return blk, 2 * wc // _MXU_OUT


def _row_synth_polyphase(a0, d0, lo_rev, hi_rev, tc: int, hl_n: int,
                         off: int):
    """Sublane-axis synthesis without upsampling: the even/odd output row
    phases are F/2-tap passes over the coefficient band, interleaved at the
    end via a sublane reshape."""
    F = len(lo_rev)
    cols = a0.shape[1]
    phases = []
    for rho in (0, 1):
        acc = None
        for j in range(F):
            if (j + rho - off) % 2:
                continue
            delta = (j + rho - off) // 2
            start = hl_n + delta
            term = None
            if lo_rev[j] != 0.0:  # skip exact-zero taps (VPU-bound)
                term = jax.lax.slice_in_dim(a0, start, start + tc,
                                            axis=0) * lo_rev[j]
            if hi_rev[j] != 0.0:
                pd = jax.lax.slice_in_dim(d0, start, start + tc,
                                          axis=0) * hi_rev[j]
                term = pd if term is None else term + pd
            if term is not None:
                acc = term if acc is None else acc + term
        if acc is None:
            acc = jnp.zeros((tc, cols), a0.dtype)
        phases.append(acc)
    return jnp.stack(phases, axis=1).reshape(2 * tc, cols)


def _synthesis2d_kernel(ll_hbm, hl_hbm, lh_hbm, hh_hbm, out_ref,
                        b_ll, b_hl, b_lh, b_hh, sem, *,
                        tc: int, hc: int, wc: int, F: int,
                        lo_rev, hi_rev, slo_ref=None,
                        hpc: int = 0, thr_ref=None, thr_ll: bool = False,
                        sub: int = 8):
    """Fused 2-D synthesis for one coefficient row band: W-axis synthesis
    (transposed, lane-circular) then row-axis synthesis with halo rows —
    a single HBM read + write per level.  Subband bands are double-buffered
    (leading slot axis of 2): step n's compute overlaps step n+1's DMA.

    ``thr_ref`` (optional SMEM scalar) fuses the hard threshold
    (|c| < thr -> 0, reference strict-``<`` semantics,
    /root/reference/ResNet/dwt_pruning.py:25-32) into the coefficient load —
    the prune pipeline then never materializes thresholded coefficients in
    HBM.  ``thr_ll`` additionally thresholds the approximation band (only
    true at the coarsest level; upper levels receive reconstructed LLs)."""
    b = pl.program_id(0)
    i = pl.program_id(1)
    nb = pl.num_programs(1)
    n = b * nb + i
    total = pl.num_programs(0) * nb
    off = F // 2
    hl_n = _aligned_halo((off + 1) // 2, sub)
    hr_n = _aligned_halo((F - off) // 2, sub)

    def start_fetch(step):
        slot = jax.lax.rem(step, jnp.int32(2))
        bb = step // nb
        r0 = jax.lax.rem(step, jnp.int32(nb)) * tc

        def fetch(hbm, buf, slot0):
            cps = []
            if hl_n:
                top = pl.multiple_of(
                    jax.lax.rem(r0 - hl_n + hc, jnp.int32(hc)), sub)
                cps.append(pltpu.make_async_copy(
                    hbm.at[bb, pl.ds(top, hl_n), :],
                    buf.at[slot, pl.ds(0, hl_n), :],
                    sem.at[slot, slot0]))
            if hr_n:
                bot = pl.multiple_of(jax.lax.rem(r0 + tc, jnp.int32(hc)), sub)
                cps.append(pltpu.make_async_copy(
                    hbm.at[bb, pl.ds(bot, hr_n), :],
                    buf.at[slot, pl.ds(hl_n + tc, hr_n), :],
                    sem.at[slot, slot0 + 1]))
            cps.append(pltpu.make_async_copy(
                hbm.at[bb, pl.ds(pl.multiple_of(r0, sub), tc), :],
                buf.at[slot, pl.ds(hl_n, tc), :],
                sem.at[slot, slot0 + 2]))
            return cps

        return (fetch(ll_hbm, b_ll, 0) + fetch(hl_hbm, b_hl, 3)
                + fetch(lh_hbm, b_lh, 6) + fetch(hh_hbm, b_hh, 9))

    @pl.when(n == 0)
    def _():
        for c in start_fetch(n):
            c.start()

    @pl.when(n + 1 < total)
    def _():
        for c in start_fetch(n + 1):
            c.start()

    for c in start_fetch(n):
        c.wait()

    slot = jax.lax.rem(n, jnp.int32(2))

    def rd(buf, detail: bool):
        x = buf[slot].astype(jnp.float32)
        if thr_ref is not None and (detail or thr_ll):
            t = thr_ref[0, 0]
            x = jnp.where(jnp.abs(x) < t, jnp.zeros((), x.dtype), x)
        return x

    if slo_ref is not None:
        S = slo_ref[...]
        bf16 = jnp.dtype(out_ref.dtype) == jnp.bfloat16
        blk_a, nblk = _wsynth_mxu_prep(rd(b_ll, False), rd(b_lh, True), S,
                                       hpc, bf16)
        blk_d, _ = _wsynth_mxu_prep(rd(b_hl, True), rd(b_hh, True), S,
                                    hpc, bf16)
        # bulk concat + one polyphase over the full width (registers fit at
        # periodization band sizes; see the analysis kernel note)
        a0 = jnp.concatenate([blk_a(j0) for j0 in range(nblk)], axis=1)
        d0 = jnp.concatenate([blk_d(j0) for j0 in range(nblk)], axis=1)
        out_ref[...] = _row_synth_polyphase(a0, d0, lo_rev, hi_rev, tc,
                                            hl_n, off).astype(out_ref.dtype)
        return
    else:
        def wsynth(a_band, d_band, a_detail):
            # transpose fallback: W on sublanes, upsample + circular ext +
            # F-tap pass, transpose back.
            at = rd(a_band, a_detail).T  # (wc, R)
            dt = rd(d_band, True).T
            ua = _upsample_rows(at)  # (2wc, R)
            ud = _upsample_rows(dt)
            n2 = 2 * wc

            def extend(u):
                return jnp.concatenate(
                    [u[n2 - off:, :], u, u[: F - 1 - off, :]], axis=0)

            xt = _synth_pass_rows(extend(ua), extend(ud), lo_rev, hi_rev, n2)
            return xt.T  # (R, 2wc)

        a0 = wsynth(b_ll, b_lh, False)
        d0 = wsynth(b_hl, b_hh, True)
    out_ref[...] = _row_synth_polyphase(a0, d0, lo_rev, hi_rev, tc, hl_n,
                                        off).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("wavelet", "tc", "interpret",
                                              "threshold_ll"))
def idwt2_level_pallas(ll, hl, lh, hh, wavelet: str, tc: int = 128,
                       interpret: bool | None = None,
                       threshold=None, threshold_ll: bool = False):
    """Single-level 2-D periodization synthesis from four (B, HC, WC)
    subbands -> (B, 2HC, 2WC), as ONE fused Pallas kernel.

    ``threshold`` (traced f32 scalar) fuses |c| < thr -> 0 over the detail
    bands (and LL too iff ``threshold_ll``) into the coefficient load."""
    w = _as_wavelet(wavelet)
    interpret = INTERPRET if interpret is None else interpret
    B, HC, WC = ll.shape
    sub = _sublane(ll.dtype)
    F = w.rec_len
    off = F // 2
    tc = min(tc, HC)
    assert HC % tc == 0
    hl_n = _aligned_halo((off + 1) // 2, sub)
    hr_n = _aligned_halo((F - off) // 2, sub)
    assert hl_n <= HC and hr_n <= HC, "subband too short for halo wrap"
    lo_rev = tuple(float(v) for v in w.rec_lo[::-1])
    hi_rev = tuple(float(v) for v in w.rec_hi[::-1])

    grid = (B, HC // tc)
    out_spec = pl.BlockSpec((1, 2 * tc, 2 * WC), lambda b, i: (b, i, 0),
                            memory_space=pltpu.VMEM)
    band = pltpu.VMEM((2, tc + hl_n + hr_n, WC), ll.dtype)

    use_mxu = WC % 64 == 0
    has_thr = threshold is not None
    thr_args = ()
    thr_specs = []
    if has_thr:
        thr_args = (jnp.asarray(threshold, jnp.float32).reshape(1, 1),)
        thr_specs = [pl.BlockSpec((1, 1), lambda b, i: (0, 0),
                                  memory_space=pltpu.SMEM)]
    if use_mxu:
        hpc = F // 2
        S_np = _row_synthesis_matrices(w, hpc)

        def wrapped(ll_h, hl_h, lh_h, hh_h, sref, *rest):
            (tref, out, b_ll, b_hl, b_lh, b_hh, sem) = (
                rest if has_thr else (None,) + rest)
            _synthesis2d_kernel(
                ll_h, hl_h, lh_h, hh_h, out.at[0],
                b_ll, b_hl, b_lh, b_hh, sem,
                tc=tc, hc=HC, wc=WC, F=F, lo_rev=lo_rev, hi_rev=hi_rev,
                slo_ref=sref, hpc=hpc, thr_ref=tref, thr_ll=threshold_ll,
                sub=sub)

        in_specs = ([pl.BlockSpec(memory_space=pltpu.ANY)] * 4
                    + [pl.BlockSpec(memory_space=pltpu.VMEM)] + thr_specs)
        args = (ll, hl, lh, hh, jnp.asarray(S_np)) + thr_args
    else:
        def wrapped(ll_h, hl_h, lh_h, hh_h, *rest):
            (tref, out, b_ll, b_hl, b_lh, b_hh, sem) = (
                rest if has_thr else (None,) + rest)
            _synthesis2d_kernel(
                ll_h, hl_h, lh_h, hh_h, out.at[0],
                b_ll, b_hl, b_lh, b_hh, sem,
                tc=tc, hc=HC, wc=WC, F=F, lo_rev=lo_rev, hi_rev=hi_rev,
                thr_ref=tref, thr_ll=threshold_ll, sub=sub)

        in_specs = [pl.BlockSpec(memory_space=pltpu.ANY)] * 4 + thr_specs
        args = (ll, hl, lh, hh) + thr_args

    return pl.pallas_call(
        wrapped,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((B, 2 * HC, 2 * WC), ll.dtype),
        scratch_shapes=[band, band, band, band,
                        pltpu.SemaphoreType.DMA((2, 12))],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20),
        interpret=interpret,
    )(*args)


def wavedec2_pallas(x, wavelet: str, level: int,
                    interpret: bool | None = None):
    """Multi-level analysis; returns [cA, (hl, lh, hh) coarse->fine] with
    subbands shaped (B, h, w) — pywt ordering (hl='da'=cH)."""
    coeffs = []
    a = x
    for _ in range(level):
        ll, hl, lh, hh = dwt2_level_pallas(a, wavelet, interpret=interpret)
        coeffs.append((hl, lh, hh))
        a = ll
    return [a] + coeffs[::-1]


def waverec2_pallas(coeffs, wavelet: str, interpret: bool | None = None,
                    threshold=None):
    """Multi-level synthesis.  ``threshold`` (traced scalar) applies the
    fused hard threshold to every coefficient band exactly once: details at
    every level, the approximation only at the coarsest (upper levels'
    LL inputs are already reconstructed signal, not stored coefficients)."""
    a = coeffs[0]
    first = True
    for (hl, lh, hh) in coeffs[1:]:
        a = idwt2_level_pallas(a, hl, lh, hh, wavelet, interpret=interpret,
                               threshold=threshold,
                               threshold_ll=first and threshold is not None)
        first = False
    return a


# ---------------------------------------------------------------------------
# Non-periodization boundary modes: XLA edge extension + VALID-mode kernels
# ---------------------------------------------------------------------------
#
# pywt's non-periodization analysis is a VALID filter bank over the
# (F-1)-extended signal: a[k] = sum_j dec_rev[j] * xe[2k + j] with
# xe = extend(x)[1:] (ops/dwt_numpy.py conventions), out = (n + F - 1)//2.
# The extension itself touches only 2*(F-1) edge rows/cols — built with one
# cheap jnp.pad — so ONE mode-agnostic valid-mode kernel serves symmetric /
# reflect / zero / periodic / constant (BASELINE.json's symmetric-extension
# requirement), with all boundary logic out of the kernel.

_PAD_MODE = {
    "symmetric": "symmetric",
    "reflect": "reflect",
    "zero": "constant",
    "periodic": "wrap",
    "constant": "edge",
}


def _per_direct_ok(h: int, w_: int, F: int, synth_hc: int | None = None,
                   sub: int = 8) -> bool:
    """True when the DIRECT periodization kernels accept an (h, w_) input
    efficiently (MXU row pass, aligned circular halo DMAs).  Everything
    else routes through the circular-extension valid-kernel path."""
    halo = F // 2 - 1
    if h % 2 or w_ % 2 or w_ % _AIN:
        return False
    tm = 256 if h % 256 == 0 else min(128, h)
    if h % tm or halo >= tm:
        return False
    if synth_hc is not None:
        hc = synth_hc
        tc = min(128, hc)
        if hc % tc:
            return False
        off = F // 2
        if (_aligned_halo((off + 1) // 2, sub) > hc
                or _aligned_halo((F - off) // 2, sub) > hc):
            return False
    return True


def _row_analysis_matrices_valid(w: Wavelet):
    """Valid-mode banded analysis operator: out[:, 64*j0 + c] =
    xe_block[128*j0 : 128*j0 + 126 + F] @ T[:, c], T[r, c] = dec_rev[r - 2c]
    (lo taps in [:, :64], hi in [:, 64:])."""
    F = w.dec_len
    lo_rev = w.dec_lo[::-1]
    hi_rev = w.dec_hi[::-1]
    rows = _AIN + F - 2
    T = np.zeros((rows, 2 * _AOUT), np.float32)
    for c in range(_AOUT):
        for j in range(F):
            T[2 * c + j, c] += lo_rev[j]
            T[2 * c + j, _AOUT + c] += hi_rev[j]
    return T


def _row_pass_valid_mxu_prep(xe, T, F: int, out_cols: int):
    """Lane-axis valid analysis as banded block matmuls; ``xe`` is already
    extension-padded (width >= 2*out_cols + F - 2).  Returns
    ``(blk(j0) -> (rows, 2*_AOUT), nblk)`` — one live block at a time (see
    _row_pass_mxu_prep)."""
    if _MXU_BF16X3:
        eh, el = _split_bf16(xe)
        Th, Tl = _split_bf16(T)

    def blk(j0):
        sl = lambda a: jax.lax.slice_in_dim(
            a, _AIN * j0, _AIN * j0 + _AIN + F - 2, axis=1)
        if _MXU_BF16X3:
            return _dot(sl(eh), Th) + _dot(sl(el), Th) + _dot(sl(eh), Tl)
        return jnp.dot(sl(xe), T, precision=jax.lax.Precision.HIGHEST,
                       preferred_element_type=jnp.float32)

    return blk, out_cols // _AOUT


# Shared sizing helpers: the PADDED analysis output (``padded_out=True``)
# must be at least as large as what the valid-mode synthesis kernel DMAs,
# so both sides compute band geometry through these single sources of truth.

def _synth_tno(h_out: int, sub: int) -> int:
    """Synthesis row-band height (must keep k0 = step*tno/2 sub-aligned)."""
    tno = min(256, -(-h_out // (2 * sub)) * (2 * sub))
    if tno % (2 * sub):
        tno = -(-tno // (2 * sub)) * (2 * sub)
    return tno


def _synth_rows_needed(h_out: int, F: int, sub: int) -> int:
    """Coefficient rows the synthesis kernel's last band DMA touches."""
    tno = _synth_tno(h_out, sub)
    nb = -(-h_out // tno)
    krows = -(-(tno // 2 + (F - 1) // 2) // sub) * sub
    return (nb - 1) * (tno // 2) + krows


def _synth_cols_needed(w_out: int, F: int) -> int:
    """Coefficient lane width the synthesis kernel's band DMA needs
    (128-aligned)."""
    wout_pad = -(-w_out // _MXU_OUT) * _MXU_OUT
    wv = 64 + (F - 1) // 2
    return -(-((wout_pad // _MXU_OUT - 1) * 64 + wv) // 128) * 128


def _analysis_kernel_ext(xe_hbm, ll_ref, hl_ref, lh_ref, hh_ref, band, sem,
                         *, tmo: int, lr: int, wp: int, F: int,
                         lo_rev, hi_rev, tref, sub: int = 8,
                         mask_shape=None):
    """Valid-mode fused 2-D analysis over the pre-extended input: one
    contiguous double-buffered band DMA per step, no boundary cases.

    ``mask_shape=(hp_out, wp_out)`` (static) zeroes every output cell beyond
    the true subband extent — emitted pad regions are EXACT zeros, so
    downstream consumers (synthesis band DMAs, the Pallas count kernel) can
    read the padded arrays directly with the physical zeros accounted
    analytically in the percentile rank."""
    b = pl.program_id(0)
    i = pl.program_id(1)
    nb = pl.num_programs(1)
    n = b * nb + i
    total = pl.num_programs(0) * nb

    def fetch(step):
        slot = jax.lax.rem(step, jnp.int32(2))
        r0 = jax.lax.rem(step, jnp.int32(nb)) * (2 * tmo)
        bb = step // nb
        return pltpu.make_async_copy(
            xe_hbm.at[bb, pl.ds(pl.multiple_of(r0, sub), lr), :],
            band.at[slot], sem.at[slot])

    @pl.when(n == 0)
    def _():
        fetch(n).start()

    @pl.when(n + 1 < total)
    def _():
        fetch(n + 1).start()

    fetch(n).wait()
    x = band[jax.lax.rem(n, jnp.int32(2))].astype(jnp.float32)
    a0, d0 = _col_pass(x, lo_rev, hi_rev, tmo)
    T = tref[...]
    blk_a, nblk = _row_pass_valid_mxu_prep(a0, T, F, wp)
    blk_d, _ = _row_pass_valid_mxu_prep(d0, T, F, wp)
    if mask_shape is not None:
        hp_out, wp_out = mask_shape
        rowi = (jax.lax.broadcasted_iota(jnp.int32, (tmo, _AOUT), 0)
                + i * tmo)
        coli = jax.lax.broadcasted_iota(jnp.int32, (tmo, _AOUT), 1)
        zero = jnp.zeros((), jnp.float32)
    # one 64-wide block live at a time (bulk concats spill registers)
    for j0 in range(nblk):
        ds = pl.ds(j0 * _AOUT, _AOUT)
        both_a = blk_a(j0)
        both_d = blk_d(j0)
        ll, lh = both_a[:, :_AOUT], both_a[:, _AOUT:]
        hl, hh = both_d[:, :_AOUT], both_d[:, _AOUT:]
        if mask_shape is not None:
            keep = (rowi < hp_out) & (coli + j0 * _AOUT < wp_out)
            ll = jnp.where(keep, ll, zero)
            hl = jnp.where(keep, hl, zero)
            lh = jnp.where(keep, lh, zero)
            hh = jnp.where(keep, hh, zero)
        ll_ref[:, ds] = ll.astype(ll_ref.dtype)
        hl_ref[:, ds] = hl.astype(hl_ref.dtype)
        lh_ref[:, ds] = lh.astype(lh_ref.dtype)
        hh_ref[:, ds] = hh.astype(hh_ref.dtype)


@functools.partial(jax.jit, static_argnames=("wavelet", "mode", "tmo",
                                             "interpret", "true_shape",
                                             "padded_out"))
def dwt2_level_pallas_mode(x, wavelet: str, mode: str = "symmetric",
                           tmo: int = 128, interpret: bool | None = None,
                           true_shape=None, padded_out: bool = False):
    """Single-level 2-D DWT of (B, H, W) for NON-periodization modes
    (symmetric / reflect / zero / periodic / constant): jnp.pad edge
    extension + one fused valid-mode Pallas kernel.  Returns (ll, hl, lh,
    hh), each (B, (H+F-1)//2, (W+F-1)//2) — pywt sizes.

    ``true_shape=(h, w)`` (static): the input's real extent when ``x`` is a
    tile-padded LL from a previous ``padded_out`` level — the extension pad
    is built from ``x[:, :h, :w]`` (the slice fuses into the pad's copy).

    ``padded_out=True`` keeps the subbands TILE-PADDED (no output slice):
    rows/lanes are sized to cover both the Pallas count kernel's (8, 128)
    alignment and the valid-mode synthesis kernel's band DMAs
    (``_synth_rows_needed`` / ``_synth_cols_needed``), and the kernel writes
    EXACT ZEROS beyond (hp_out, wp_out).  This removes three materialized
    copies per level from the prune pipeline (subband slice here, re-pad in
    ``count_below``, prep-pad in synthesis); the physical pad zeros enter
    the reference percentile rank analytically
    (quantile.percentile_abs_pytree ``pad_zeros``, which may go negative)."""
    w = _as_wavelet(wavelet)
    interpret = INTERPRET if interpret is None else interpret
    B = x.shape[0]
    H, W = true_shape if true_shape is not None else x.shape[1:]
    F = w.dec_len
    lo_rev = tuple(float(v) for v in w.dec_lo[::-1])
    hi_rev = tuple(float(v) for v in w.dec_hi[::-1])

    xt = x[:, :H, :W] if x.shape[1:] != (H, W) else x
    if mode == "periodization":
        if _per_direct_ok(H, W, F) and xt is x:
            return dwt2_level_pallas(x, wavelet, interpret=interpret)
        # RAGGED periodization = circular VALID filter bank: pywt first
        # edge-repeats odd dims to even (dwt_numpy._analysis_matrices), then
        # a[k] = sum_j dec_rev[j] * xe[2k + j] with xe the wrap extension of
        # F/2-1 samples per side — the same mode-agnostic valid kernel, so
        # 4095^2 / 3000x5000 tensors stop falling back to the 22x-slower
        # XLA path.
        if padded_out:  # not assert: must survive python -O
            raise NotImplementedError(
                "tile-padded pipeline unsupported for ragged periodization")
        if H % 2:
            xt = jnp.concatenate([xt, xt[:, -1:, :]], axis=1)
        if W % 2:
            xt = jnp.concatenate([xt, xt[:, :, -1:]], axis=2)
        p = F // 2 - 1
        if p:
            xe = jnp.pad(xt, [(0, 0), (p, p), (p, p)], mode="wrap")
        else:
            xe = xt
        hp_out = (H + 1) // 2
        wp_out = (W + 1) // 2
    else:
        if _direct_ext_ok(x, mode, H, W):
            # direct edge-extension kernel: no materialized jnp.pad of the
            # whole input (saves one full read+write of the tensor)
            return _dwt2_level_direct_ext(x, w, mode, H, W, tmo,
                                          padded_out, interpret)
        pad = F - 1
        hp_out = (H + F - 1) // 2
        wp_out = (W + F - 1) // 2
        if mode == "zero":
            ext = jnp.pad(xt, [(0, 0), (pad, pad), (pad, pad)])
        else:
            ext = jnp.pad(xt, [(0, 0), (pad, pad), (pad, pad)],
                          mode=_PAD_MODE[mode])
        xe = ext[:, 1:, 1:]

    sub = _sublane(x.dtype)  # bf16 needs (16, 128) tile alignment
    tmo = min(tmo, -(-hp_out // sub) * sub)
    if tmo % sub:
        tmo = -(-tmo // sub) * sub
    if padded_out:
        # cover the synthesis band DMAs reconstructing (2*hp_out - F + 2,
        # 2*wp_out - F + 2) from these subbands, and 128-lane alignment for
        # the count kernel
        rows_min = max(hp_out, _synth_rows_needed(2 * hp_out - F + 2, F, sub))
        nb = -(-rows_min // tmo)
        wp_pad = max(-(-wp_out // 128) * 128,
                     _synth_cols_needed(2 * wp_out - F + 2, F))
    else:
        nb = -(-hp_out // tmo)
        # lane extent must be 128-aligned: Mosaic cannot slice a (8,128)-
        # tiled VMEM window at a 64-only-aligned lane extent (the r3 driver
        # bench died on memref_slice 2112-of-2176 at the 4096^2 bior4.4
        # shape); the surplus 64 lanes are garbage sliced away below.
        wp_pad = -(-wp_out // _MXU_OUT) * _MXU_OUT
    lr = -(-(2 * tmo + F - 2) // sub) * sub
    rows_needed = 2 * tmo * (nb - 1) + lr
    # lane width of the DMA'd band must be 128-aligned
    cols_needed = -(-(2 * wp_pad + F - 2) // 128) * 128
    xe = jnp.pad(xe, [(0, 0),
                      (0, max(0, rows_needed - xe.shape[1])),
                      (0, max(0, cols_needed - xe.shape[2]))])

    grid = (B, nb)
    out_shape = [jax.ShapeDtypeStruct((B, nb * tmo, wp_pad), x.dtype)] * 4
    out_spec = pl.BlockSpec((1, tmo, wp_pad), lambda b, i: (b, i, 0),
                            memory_space=pltpu.VMEM)
    T_np = _row_analysis_matrices_valid(w)

    def wrapped(xe_hbm, tref, ll, hl, lh, hh, band, sem):
        _analysis_kernel_ext(
            xe_hbm, ll.at[0], hl.at[0], lh.at[0], hh.at[0], band, sem,
            tmo=tmo, lr=lr, wp=wp_pad, F=F, lo_rev=lo_rev, hi_rev=hi_rev,
            tref=tref, sub=sub,
            mask_shape=(hp_out, wp_out) if padded_out else None)

    ll, hl, lh, hh = pl.pallas_call(
        wrapped,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=[out_spec] * 4,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((2, lr, xe.shape[2]), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        interpret=interpret,
    )(xe, jnp.asarray(T_np))
    if padded_out:
        return ll, hl, lh, hh
    return tuple(s[:, :hp_out, :wp_out] for s in (ll, hl, lh, hh))


# ---------------------------------------------------------------------------
# DIRECT edge-extension analysis: no materialized jnp.pad of the input.
#
# The jnp.pad route reads + writes the WHOLE tensor once before the kernel
# ever runs (~1/3 of the symmetric roundtrip's HBM traffic at 4096^2).  The
# direct kernel reads the raw input instead and applies the boundary
# extension itself:
#   * ROWS: the extension only touches O(F) edge rows — they are
#     precomputed as tiny strip arrays (plus the input's sub-tile row
#     remainder, for DMA alignment) and the per-band DMA plan stitches
#     [top strip | input rows | bottom strip] together with static lengths
#     (special-cased boundary bands, one contiguous copy for interior
#     bands);
#   * LANES: the extension folds into the banded MXU operators — each
#     64-wide output block reads an ALIGNED 256-lane window of the raw
#     input and multiplies a per-block operator whose taps encode the
#     reflection (same 2-tile contraction cost as the extended form).
# Modes whose extension is local to each edge qualify (symmetric / reflect
# / zero / constant); 'periodic' wraps to the opposite edge and keeps the
# jnp.pad route.
# ---------------------------------------------------------------------------

_DIRECT_EXT_MODES = ("symmetric", "reflect", "zero", "constant")
_DIRECT_MASK = True  # experiment knob (tests/bisection): mask pad cells
_WIN = 256  # aligned lane window per output block (2 MXU contraction tiles)


def _virtual_lane(v: int, n: int, mode: str):
    """x-index (or None for a zero) of VIRTUAL index ``v`` of the extended
    signal; single-bounce extension (callers guarantee |overhang| <= n)."""
    if 0 <= v < n:
        return v
    if mode == "zero":
        return None
    if mode == "constant":
        return 0 if v < 0 else n - 1
    if mode == "symmetric":   # ... x1 x0 | x | x_{n-1} x_{n-2} ...
        return -1 - v if v < 0 else 2 * n - 1 - v
    if mode == "reflect":     # ... x2 x1 | x | x_{n-2} x_{n-3} ...
        return -v if v < 0 else 2 * n - 2 - v
    raise ValueError(mode)


def _edge_rows(xt, k: int, mode: str, top: bool):
    """The k extension rows adjacent to the top/bottom edge, in xe order
    (top: virtual rows -k..-1; bottom: virtual rows H..H+k-1)."""
    if k == 0:
        return xt[:, :0]
    H = xt.shape[1]
    idx = ([_virtual_lane(v, H, mode) for v in range(-k, 0)] if top
           else [_virtual_lane(v, H, mode) for v in range(H, H + k)])
    if any(i is None for i in idx):  # zero mode
        return jnp.zeros(xt.shape[:1] + (k,) + xt.shape[2:], xt.dtype)
    return xt[:, np.asarray(idx), :]


def _row_analysis_ops_direct(w: Wavelet, Wt: int, wp_out: int, nblk: int,
                             wbuf: int, mode: str):
    """Per-output-block lane operators for the direct window scheme.

    Block j0 computes out cols [64*j0, 64*j0+64) of both subbands from a
    NARROW window of the in-kernel lane-extended array
    ``exte = [zeros(padl) | a0 | zeros]`` (exte lane = x lane + padl):
        out[:, 64*j0 + c (+64)] = exte[ws[j0]:ws[j0]+kw] @ T[var][:, c...]
    with the boundary extension folded into the edge blocks' taps.

    ``kw = 126 + F`` — MXU time is proportional to the contraction length
    (measured: the earlier fixed 256-lane windows made the dot stage
    +0.29 ms/step at 4096^2, ~1.9x the narrow form), so the window is as
    narrow as the filter support allows; the one lane-shift relayout the
    concat costs is the same trick the periodization kernel uses.

    Returns (variants (V, kw, 2*_AOUT) np.f32, var_of, wstarts, padl, kw,
    exte_w)."""
    F = w.dec_len
    padl = F - 2
    kw = 126 + F + (padl % 2)  # keep parity simple; assert guards coverage
    mats: dict = {}
    var_of, wstarts = [], []
    lo_rev = w.dec_lo[::-1]
    hi_rev = w.dec_hi[::-1]
    for j0 in range(nblk):
        taps = []  # (exte_lane, cc, lo, hi)
        for cc in range(_AOUT):
            c = 64 * j0 + cc
            if c >= wp_out:
                continue  # masked output cols keep zero taps
            for j in range(F):
                v = 2 * c + j - (F - 2)  # virtual input lane
                xl = _virtual_lane(v, Wt, mode)
                if xl is None:
                    continue
                taps.append((xl + padl, cc, lo_rev[j], hi_rev[j]))
        if taps:
            min_e = min(t[0] for t in taps)
            max_e = max(t[0] for t in taps)
            ws = (min_e // 128) * 128
            assert max_e - ws < kw, (j0, ws, min_e, max_e, kw, Wt)
        else:
            ws = 0
        T = np.zeros((kw, 2 * _AOUT), np.float32)
        for e, cc, lo, hi in taps:
            T[e - ws, cc] += lo
            T[e - ws, _AOUT + cc] += hi
        key = (ws - 128 * j0, T.tobytes())
        if key not in mats:
            mats[key] = (len(mats), T)
        var_of.append(mats[key][0])
        wstarts.append(ws)
    variants = np.stack(
        [t for _, t in sorted(mats.values(), key=lambda p: p[0])])
    exte_w = max(ws + kw for ws in wstarts)
    return variants, tuple(var_of), tuple(wstarts), padl, kw, exte_w


def _row_fetch_plans(nb: int, tmo: int, lrv: int, regions):
    """Static per-band DMA plans over the virtual row layout.  ``regions``:
    [(src_id, v_start, v_len)] with 8-aligned bounds.  Returns (plans,
    (g_lo, g_hi)) where bands g_lo..g_hi share the generic single-copy
    interior plan (one contiguous fetch from the main input)."""
    plans = []
    for K in range(nb):
        r0 = 2 * tmo * K
        plan = []
        for sid, v0, vlen in regions:
            s, e = max(r0, v0), min(r0 + lrv, v0 + vlen)
            if e > s:
                plan.append((sid, s - v0, s - r0, e - s))
        plans.append(plan)
    generic = [K for K, p in enumerate(plans)
               if len(p) == 1 and p[0][0] == 1 and p[0][3] == lrv]
    if generic:
        g_lo, g_hi = generic[0], generic[-1]
        assert generic == list(range(g_lo, g_hi + 1)), generic
    else:
        g_lo, g_hi = 1, 0  # empty range
    return plans, (g_lo, g_hi)


def _analysis_kernel_direct(x_hbm, bnd_hbm, th_ref, tl_ref,
                            ll_ref, hl_ref, lh_ref, hh_ref, band, sem, *,
                            tmo: int, lrv: int, shift: int,
                            lo_rev, hi_rev, grange, boundary_Ks,
                            hp_top: int, var_of, wstarts, mask_shape,
                            sub: int, padl: int, kw: int, exte_w: int):
    """Fused direct-extension 2-D analysis.  Every band is exactly ONE
    band-sized DMA: interior bands fetch straight from the input at a
    traced offset; the few boundary bands fetch their pre-stitched content
    from the small ``bnd_hbm`` side array (built on the host side of the
    kernel from [top strip | input rows | bottom strip]).  Only the DMA
    SOURCE is conditional — sizes, destination, and the wait are uniform,
    so the double-buffered pipeline never stalls on branchy waits (the
    first multi-copy-plan version measured 243 GB/s vs the synthesis
    kernel's 543).  ``tl_ref`` is None on the f32-HIGHEST path."""
    b = pl.program_id(0)
    i = pl.program_id(1)
    nb = pl.num_programs(1)
    n = b * nb + i
    total = pl.num_programs(0) * nb
    g_lo, g_hi = grange

    def start(step):
        slot = jax.lax.rem(step, jnp.int32(2))
        K = jax.lax.rem(step, jnp.int32(nb))
        bb = step // nb
        if g_lo <= g_hi:
            @pl.when((K >= g_lo) & (K <= g_hi))
            def _():
                pltpu.make_async_copy(
                    x_hbm.at[bb, pl.ds(
                        pl.multiple_of(2 * tmo * K - hp_top, sub), lrv), :],
                    band.at[slot], sem.at[slot]).start()
        for bi, K_s in enumerate(boundary_Ks):
            @pl.when(K == K_s)
            def _(bi=bi):
                pltpu.make_async_copy(
                    bnd_hbm.at[bb, pl.ds(bi * lrv, lrv), :],
                    band.at[slot], sem.at[slot]).start()

    @pl.when(n == 0)
    def _():
        start(n)

    @pl.when(n + 1 < total)
    def _():
        start(n + 1)

    # uniform wait: exactly one band-sized copy signals sem[slot] per step
    # (descriptor only supplies sizes/semaphore)
    slot_w = jax.lax.rem(n, jnp.int32(2))
    pltpu.make_async_copy(bnd_hbm.at[n // nb, pl.ds(0, lrv), :],
                          band.at[slot_w], sem.at[slot_w]).wait()

    xb = band[jax.lax.rem(n, jnp.int32(2))].astype(jnp.float32)
    a0, d0 = _col_pass(xb, lo_rev, hi_rev, tmo, shift=shift)

    # lane-extend once per half (a single lane-shift relayout, exactly the
    # periodization kernel's trick) so each block's dot contracts only the
    # narrow kw window — MXU time is proportional to the contraction length
    def exte(t):
        cols = t.shape[1]
        parts = []
        if padl:
            parts.append(jnp.zeros((tmo, padl), jnp.float32))
        parts.append(t)
        pr = max(0, exte_w - padl - cols)
        if pr:
            parts.append(jnp.zeros((tmo, pr), jnp.float32))
        return parts[0] if len(parts) == 1 else jnp.concatenate(parts,
                                                                axis=1)

    a0 = exte(a0)
    d0 = exte(d0)

    bf16x3 = tl_ref is not None
    if bf16x3:
        ah, al = _split_bf16(a0)
        dh, dl = _split_bf16(d0)
    hp_out, wp_out = mask_shape
    nblk = len(var_of)
    rowi = jax.lax.broadcasted_iota(jnp.int32, (tmo, nblk * _AOUT), 0) \
        + i * tmo
    coli = jax.lax.broadcasted_iota(jnp.int32, (tmo, nblk * _AOUT), 1)
    zero = jnp.zeros((), jnp.float32)

    # hoist the few distinct operator variants out of the block loop (one
    # VMEM read each instead of one per 64-wide block)
    n_var = max(var_of) + 1
    Ths = [th_ref[v] for v in range(n_var)]
    Tls = [tl_ref[v] for v in range(n_var)] if bf16x3 else None

    def blk(j0, hi):
        var, ws = var_of[j0], wstarts[j0]
        sl = lambda t: jax.lax.slice_in_dim(t, ws, ws + kw, axis=1)
        if bf16x3:
            h_, l_ = (ah, al) if not hi else (dh, dl)
            return (_dot(sl(h_), Ths[var]) + _dot(sl(l_), Ths[var])
                    + _dot(sl(h_), Tls[var]))
        return jnp.dot(sl(a0 if not hi else d0), Ths[var],
                       precision=jax.lax.Precision.HIGHEST,
                       preferred_element_type=jnp.float32)

    # BULK full-width stores with one vectorized mask (the per-block
    # 64-wide masked stores ran ~20% slower — same effect the
    # periodization kernel measured; registers fit at tmo=128)
    keep = (rowi < hp_out) & (coli < wp_out)

    def bulk(hi):
        los, his = [], []
        for j0 in range(nblk):
            both = blk(j0, hi)
            los.append(both[:, :_AOUT])
            his.append(both[:, _AOUT:])
        if not _DIRECT_MASK:  # experiment knob: pad cells keep garbage
            return jnp.concatenate(los, axis=1), jnp.concatenate(his, axis=1)
        return (jnp.where(keep, jnp.concatenate(los, axis=1), zero),
                jnp.where(keep, jnp.concatenate(his, axis=1), zero))

    ll, lh = bulk(False)
    hl, hh = bulk(True)
    ll_ref[...] = ll.astype(ll_ref.dtype)
    lh_ref[...] = lh.astype(lh_ref.dtype)
    hl_ref[...] = hl.astype(hl_ref.dtype)
    hh_ref[...] = hh.astype(hh_ref.dtype)


def _dwt2_level_direct_ext(x, w: Wavelet, mode: str, H: int, W: int,
                           tmo: int, padded_out: bool, interpret: bool):
    """Direct edge-extension single-level analysis (see block comment
    above).  Output contract matches ``dwt2_level_pallas_mode``: tile-padded
    exact-zero-masked subbands for ``padded_out``, pywt-sliced otherwise."""
    B = x.shape[0]
    F = w.dec_len
    sub = _sublane(x.dtype)
    wbuf = x.shape[2]
    hp_out = (H + F - 1) // 2
    wp_out = (W + F - 1) // 2
    lo_rev = tuple(float(v) for v in w.dec_lo[::-1])
    hi_rev = tuple(float(v) for v in w.dec_hi[::-1])

    tmo = min(tmo, -(-hp_out // sub) * sub)
    if tmo % sub:
        tmo = -(-tmo // sub) * sub
    if padded_out:
        rows_min = max(hp_out, _synth_rows_needed(2 * hp_out - F + 2, F, sub))
        wp_pad = max(-(-wp_out // 128) * 128,
                     _synth_cols_needed(2 * wp_out - F + 2, F))
    else:
        rows_min = hp_out
        wp_pad = -(-wp_out // _MXU_OUT) * _MXU_OUT
    nb = -(-rows_min // tmo)

    # virtual row layout: [junk+top strip | aligned input body | remainder
    # + bottom strip + zero tail]; all region bounds sub-aligned
    hp_top = max(-(-(F - 2) // sub) * sub, sub)
    shift = hp_top - (F - 2)
    lrv = -(-(2 * tmo - 2 + shift + F) // sub) * sub
    Hm = (H // sub) * sub
    rows_needed = 2 * tmo * (nb - 1) + lrv
    bot_rows = max(rows_needed - hp_top - Hm, 0)
    bot_rows = -(-bot_rows // sub) * sub

    # kernel DMAs straight from x (any tile-padded rows beyond Hm are never
    # fetched); only the tiny strips are built with XLA
    xt = x[:, :H, :W]  # strip-building view — O(F) rows gathered from it

    def to_wbuf(t):
        if t.shape[2] == wbuf:
            return t
        return jnp.pad(t, [(0, 0), (0, 0), (0, wbuf - t.shape[2])])

    # strips: tiny XLA builds (O(F + sub) rows each)
    top_strip = to_wbuf(jnp.pad(_edge_rows(xt, F - 2, mode, top=True),
                                [(0, 0), (shift, 0), (0, 0)]))
    rem = xt[:, Hm:H, :]
    bot_real = jnp.concatenate(
        [rem, _edge_rows(xt, F - 1, mode, top=False)], axis=1)
    bot_strip = to_wbuf(jnp.pad(
        bot_real,
        [(0, 0), (0, max(0, bot_rows - bot_real.shape[1])), (0, 0)]))
    bot_strip = bot_strip[:, :bot_rows]

    regions = [(0, 0, hp_top), (1, hp_top, Hm), (2, hp_top + Hm, bot_rows)]
    plans, grange = _row_fetch_plans(nb, tmo, lrv, regions)
    g_lo, g_hi = grange
    boundary_Ks = tuple(K for K in range(nb) if not (g_lo <= K <= g_hi))
    # pre-stitch every boundary band's full content into one small side
    # array (a few bands of lrv rows): the kernel then needs exactly one
    # uniform band-sized DMA per step — see _analysis_kernel_direct
    srcs = (top_strip, to_wbuf(x), bot_strip)
    pieces = []
    for K in boundary_Ks:
        segs, pos = [], 0
        for sid, src_off, dst_off, length in plans[K]:
            if dst_off > pos:
                segs.append(jnp.zeros((B, dst_off - pos, wbuf), x.dtype))
            segs.append(jax.lax.slice_in_dim(
                srcs[sid], src_off, src_off + length, axis=1))
            pos = dst_off + length
        if pos < lrv:
            segs.append(jnp.zeros((B, lrv - pos, wbuf), x.dtype))
        pieces.append(jnp.concatenate(segs, axis=1))
    bnd = (jnp.concatenate(pieces, axis=1) if pieces
           else jnp.zeros((B, lrv, wbuf), x.dtype))

    nblk = wp_pad // _AOUT
    variants, var_of, wstarts, padl, kw, exte_w = _row_analysis_ops_direct(
        w, W, wp_out, nblk, wbuf, mode)
    bf16x3 = _MXU_BF16X3
    if bf16x3:
        vh = variants.astype(np.dtype("bfloat16"))
        vl = (variants - vh.astype(np.float32)).astype(np.dtype("bfloat16"))
        t_args = (jnp.asarray(vh), jnp.asarray(vl))
    else:
        t_args = (jnp.asarray(variants),)

    grid = (B, nb)
    out_shape = [jax.ShapeDtypeStruct((B, nb * tmo, wp_pad), x.dtype)] * 4
    out_spec = pl.BlockSpec((1, tmo, wp_pad), lambda b, i: (b, i, 0),
                            memory_space=pltpu.VMEM)

    def wrapped(x_h, bnd_h, *rest):
        if bf16x3:
            (th, tl, ll, hl, lh, hh, band, sem) = rest
        else:
            (th, ll, hl, lh, hh, band, sem) = rest
            tl = None
        _analysis_kernel_direct(
            x_h, bnd_h, th, tl,
            ll.at[0], hl.at[0], lh.at[0], hh.at[0], band, sem,
            tmo=tmo, lrv=lrv, shift=shift, lo_rev=lo_rev, hi_rev=hi_rev,
            grange=grange, boundary_Ks=boundary_Ks, hp_top=hp_top,
            var_of=var_of, wstarts=wstarts,
            mask_shape=(hp_out, wp_out), sub=sub,
            padl=padl, kw=kw, exte_w=exte_w)

    ll, hl, lh, hh = pl.pallas_call(
        wrapped,
        grid=grid,
        in_specs=([pl.BlockSpec(memory_space=pltpu.ANY)] * 2
                  + [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(t_args)),
        out_specs=[out_spec] * 4,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((2, lrv, wbuf), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        interpret=interpret,
    )(x, bnd, *t_args)
    if padded_out:
        return ll, hl, lh, hh
    return tuple(s[:, :hp_out, :wp_out] for s in (ll, hl, lh, hh))


def _direct_ext_ok(x, mode: str, H: int, W: int) -> bool:
    """Route eligibility for the direct edge-extension analysis kernel
    (48 > 2 * max dec_len keeps single-bounce reflections in range)."""
    return (mode in _DIRECT_EXT_MODES
            and x.dtype == jnp.float32
            and x.shape[2] % 128 == 0
            and x.shape[2] >= _WIN
            and W >= _WIN and H >= 48)


def _row_synthesis_matrices_valid(w: Wavelet, wv: int):
    """Valid-mode banded synthesis operator: out col block
    X[128*b0 + c] = sum_k a[64*b0 + kr] rec_lo[c - 2kr + F - 2] + (hi term);
    S is (2*wv, 128) with lo rows stacked over hi rows."""
    F = w.rec_len
    lo = w.rec_lo
    hi = w.rec_hi
    S = np.zeros((2 * wv, _MXU_OUT), np.float32)
    for kr in range(wv):
        for c in range(_MXU_OUT):
            idx = c - 2 * kr + F - 2
            if 0 <= idx < F:
                S[kr, c] += lo[idx]
                S[wv + kr, c] += hi[idx]
    return S


def _wsynth_valid_mxu_prep(a, d, S, wv: int, out_cols: int):
    """Lane-axis valid synthesis as banded block matmuls; coefficient
    arrays are tail-padded so every slice is in range.  Returns
    ``(blk(b0), nblk)`` — one live 128-wide block at a time."""
    if _MXU_BF16X3:
        ah, al = _split_bf16(a)
        dh, dl = _split_bf16(d)
        Sh, Sl = _split_bf16(S)

    def blk(b0):
        def blk_of(aa, dd):
            sa = jax.lax.slice_in_dim(aa, 64 * b0, 64 * b0 + wv, axis=1)
            sd = jax.lax.slice_in_dim(dd, 64 * b0, 64 * b0 + wv, axis=1)
            return jnp.concatenate([sa, sd], axis=1)
        if _MXU_BF16X3:
            bh = blk_of(ah, dh)
            return _dot(bh, Sh) + _dot(blk_of(al, dl), Sh) + _dot(bh, Sl)
        return jnp.dot(blk_of(a, d), S,
                       precision=jax.lax.Precision.HIGHEST,
                       preferred_element_type=jnp.float32)

    return blk, out_cols // _MXU_OUT


def _row_synth_polyphase_valid(a0, d0, lo_rev, hi_rev, tno: int):
    """Sublane-axis valid synthesis: out row i (band-local, band starts at an
    EVEN global row) = sum over j with j ≡ (1 - i) (mod 2) of
    rec_rev[j] * band[(i + j - 1) // 2]."""
    F = len(lo_rev)
    cols = a0.shape[1]
    phases = []
    for rho in (0, 1):
        acc = None
        for j in range(F):
            if (rho + j - 1) % 2:
                continue
            delta = (rho + j - 1) // 2
            term = None
            if lo_rev[j] != 0.0:  # skip exact-zero taps (VPU-bound)
                term = jax.lax.slice_in_dim(
                    a0, delta, delta + tno // 2, axis=0) * lo_rev[j]
            if hi_rev[j] != 0.0:
                pd = jax.lax.slice_in_dim(
                    d0, delta, delta + tno // 2, axis=0) * hi_rev[j]
                term = pd if term is None else term + pd
            if term is not None:
                acc = term if acc is None else acc + term
        if acc is None:
            acc = jnp.zeros((tno // 2, cols), a0.dtype)
        phases.append(acc)
    return jnp.stack(phases, axis=1).reshape(tno, cols)


def _synthesis2d_kernel_ext(ll_hbm, hl_hbm, lh_hbm, hh_hbm, sref, out_ref,
                            b_ll, b_hl, b_lh, b_hh, sem, *,
                            tno: int, krows: int, wv: int, wout: int, F: int,
                            lo_rev, hi_rev, thr_ref=None,
                            thr_ll: bool = False, sub: int = 8):
    """Fused valid-mode 2-D synthesis: one contiguous coefficient band DMA
    per subband per step (double-buffered), W-axis banded-matmul synthesis,
    then row-axis polyphase."""
    b = pl.program_id(0)
    i = pl.program_id(1)
    nb = pl.num_programs(1)
    n = b * nb + i
    total = pl.num_programs(0) * nb

    def start_fetch(step):
        slot = jax.lax.rem(step, jnp.int32(2))
        bb = step // nb
        k0 = jax.lax.rem(step, jnp.int32(nb)) * (tno // 2)
        cps = []
        for s, (hbm, buf) in enumerate(((ll_hbm, b_ll), (hl_hbm, b_hl),
                                        (lh_hbm, b_lh), (hh_hbm, b_hh))):
            cps.append(pltpu.make_async_copy(
                hbm.at[bb, pl.ds(pl.multiple_of(k0, sub), krows), :],
                buf.at[slot], sem.at[slot, s]))
        return cps

    @pl.when(n == 0)
    def _():
        for c in start_fetch(n):
            c.start()

    @pl.when(n + 1 < total)
    def _():
        for c in start_fetch(n + 1):
            c.start()

    for c in start_fetch(n):
        c.wait()

    slot = jax.lax.rem(n, jnp.int32(2))

    def rd(buf, detail: bool):
        x = buf[slot].astype(jnp.float32)
        if thr_ref is not None and (detail or thr_ll):
            t = thr_ref[0, 0]
            x = jnp.where(jnp.abs(x) < t, jnp.zeros((), x.dtype), x)
        return x

    S = sref[...]
    blk_a, nblk = _wsynth_valid_mxu_prep(rd(b_ll, False), rd(b_lh, True),
                                         S, wv, wout)
    blk_d, _ = _wsynth_valid_mxu_prep(rd(b_hl, True), rd(b_hh, True),
                                      S, wv, wout)
    # per 128-col block: lane synthesis + row polyphase + write
    for b0 in range(nblk):
        out = _row_synth_polyphase_valid(blk_a(b0), blk_d(b0), lo_rev,
                                         hi_rev, tno)
        out_ref[:, pl.ds(b0 * _MXU_OUT, _MXU_OUT)] = out.astype(
            out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("wavelet", "mode", "tno",
                                             "interpret", "threshold_ll",
                                             "true_shape"))
def idwt2_level_pallas_mode(ll, hl, lh, hh, wavelet: str,
                            mode: str = "symmetric", tno: int = 256,
                            interpret: bool | None = None,
                            threshold=None, threshold_ll: bool = False,
                            true_shape=None):
    """Single-level 2-D synthesis for NON-periodization modes from four
    (B, HC, WC) subbands -> (B, 2*HC - F + 2, 2*WC - F + 2) (pywt valid
    sizes), as one fused Pallas kernel.  ``threshold`` fuses |c|<thr->0
    into the coefficient loads (LL too iff ``threshold_ll``).

    ``true_shape=(hc, wc)`` (static): the subbands' real extent when they
    are tile-padded ``padded_out`` analysis outputs (pad cells are exact
    zeros).  The kernel reads only rows/cols the valid outputs need, the
    prep pads become no-ops, and the result stays TILE-PADDED (rows to the
    grid band, lanes to 128) — callers slice at the very end."""
    w = _as_wavelet(wavelet)
    interpret = INTERPRET if interpret is None else interpret
    if mode == "periodization":
        HC_, WC_ = ll.shape[1:]
        if (true_shape is None
                and _per_direct_ok(2 * HC_, 2 * WC_, w.rec_len,
                                   synth_hc=HC_,
                                   sub=_sublane(ll.dtype))):
            return idwt2_level_pallas(ll, hl, lh, hh, wavelet,
                                      interpret=interpret,
                                      threshold=threshold,
                                      threshold_ll=threshold_ll)
        # RAGGED periodization synthesis = VALID synthesis over WRAP-padded
        # coefficients + a static output shift: x_per[i] equals the valid
        # synthesis of the circular coefficient extension at padded output
        # index i + 1 - F/2 + 2*p, with p = ceil((F/2 - 1)/2) wrap columns/
        # rows per side (derivation mirrors dwt_numpy._synthesis_matrices).
        if true_shape is not None:  # not assert: must survive python -O
            raise NotImplementedError(
                "tile-padded pipeline unsupported for ragged periodization")
        F = w.rec_len
        off = F // 2
        p = (off - 1 + 1) // 2  # ceil((F/2 - 1) / 2)
        start = 1 - off + 2 * p
        n_h = 2 * ll.shape[1]
        n_w = 2 * ll.shape[2]

        def wrap2(c):
            if p:
                c = jnp.concatenate([c[:, -p:, :], c, c[:, :p, :]], axis=1)
                c = jnp.concatenate([c[:, :, -p:], c, c[:, :, :p]], axis=2)
            return c

        out = idwt2_level_pallas_mode(
            wrap2(ll), wrap2(hl), wrap2(lh), wrap2(hh), wavelet,
            "symmetric",  # any valid-size mode: kernels are mode-agnostic
            tno=tno, interpret=interpret, threshold=threshold,
            threshold_ll=threshold_ll)
        return out[:, start:start + n_h, start:start + n_w]
    B = ll.shape[0]
    HC, WC = true_shape if true_shape is not None else ll.shape[1:]
    F = w.rec_len
    h_out = 2 * HC - F + 2
    w_out = 2 * WC - F + 2
    lo_rev = tuple(float(v) for v in w.rec_lo[::-1])
    hi_rev = tuple(float(v) for v in w.rec_hi[::-1])

    sub = _sublane(ll.dtype)  # bf16 needs (16, 128) tile alignment
    # k0 = step * (tno // 2) must stay sub-aligned -> tno multiple of 2*sub
    tno = min(tno, _synth_tno(h_out, sub))
    if tno % (2 * sub):
        tno = -(-tno // (2 * sub)) * (2 * sub)
    nb = -(-h_out // tno)
    krows = -(-(tno // 2 + (F - 1) // 2) // sub) * sub
    rows_needed = (nb - 1) * (tno // 2) + krows
    wout_pad = -(-w_out // _MXU_OUT) * _MXU_OUT
    wv = 64 + (F - 1) // 2
    # lane width of the DMA'd coefficient bands must be 128-aligned
    cols_needed = -(-((wout_pad // _MXU_OUT - 1) * 64 + wv) // 128) * 128

    # all four band DMAs share one VMEM buffer width, so pad every subband
    # to a common lane extent (no-op zero-width pads for padded_out
    # analysis outputs, which are sized to cols_needed already)
    common_w = max(cols_needed, ll.shape[2], hl.shape[2], lh.shape[2],
                   hh.shape[2])

    def prep(c):
        return jnp.pad(c, [(0, 0),
                           (0, max(0, rows_needed - c.shape[1])),
                           (0, common_w - c.shape[2])])

    ll, hl, lh, hh = (prep(c) for c in (ll, hl, lh, hh))
    S_np = _row_synthesis_matrices_valid(w, wv)

    has_thr = threshold is not None
    thr_args = ()
    thr_specs = []
    if has_thr:
        thr_args = (jnp.asarray(threshold, jnp.float32).reshape(1, 1),)
        thr_specs = [pl.BlockSpec((1, 1), lambda b, i: (0, 0),
                                  memory_space=pltpu.SMEM)]

    grid = (B, nb)
    out_spec = pl.BlockSpec((1, tno, wout_pad), lambda b, i: (b, i, 0),
                            memory_space=pltpu.VMEM)
    band = pltpu.VMEM((2, krows, ll.shape[2]), ll.dtype)

    def wrapped(ll_h, hl_h, lh_h, hh_h, sref, *rest):
        (tref, out, b_ll, b_hl, b_lh, b_hh, sem) = (
            rest if has_thr else (None,) + rest)
        _synthesis2d_kernel_ext(
            ll_h, hl_h, lh_h, hh_h, sref, out.at[0],
            b_ll, b_hl, b_lh, b_hh, sem,
            tno=tno, krows=krows, wv=wv, wout=wout_pad, F=F,
            lo_rev=lo_rev, hi_rev=hi_rev, thr_ref=tref,
            thr_ll=threshold_ll, sub=sub)

    out = pl.pallas_call(
        wrapped,
        grid=grid,
        in_specs=([pl.BlockSpec(memory_space=pltpu.ANY)] * 4
                  + [pl.BlockSpec(memory_space=pltpu.VMEM)] + thr_specs),
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((B, nb * tno, wout_pad), ll.dtype),
        scratch_shapes=[band, band, band, band,
                        pltpu.SemaphoreType.DMA((2, 4))],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        interpret=interpret,
    )(ll, hl, lh, hh, jnp.asarray(S_np), *thr_args)
    if true_shape is not None:
        return out  # tile-padded; callers slice at the very end
    return out[:, :h_out, :w_out]


def wavedec2_pallas_mode(x, wavelet: str, level: int,
                         mode: str = "symmetric",
                         interpret: bool | None = None,
                         padded: bool = False):
    """Multi-level analysis for any boundary mode (pywt sizes per level).

    ``padded=True``: keep every subband TILE-PADDED with exact zeros (see
    ``dwt2_level_pallas_mode(padded_out=True)``) and return
    ``(coeffs, true_shapes)`` where ``true_shapes`` is
    ``[approx (h, w)] + [detail (h, w) coarse -> fine]`` aligned with the
    coeffs list — the zero-materialized-copies prune pipeline.

    ``periodization`` routes per level: direct circular kernels for aligned
    shapes, the circular-extension valid-kernel path for ragged ones (pywt
    ceil-half sizes either way)."""
    if mode == "periodization":
        if padded:  # not assert: must survive python -O
            raise NotImplementedError(
                "periodization subbands are tile-exact already; "
                "padded=True applies only to valid-size modes")
        coeffs = []
        a = x
        for _ in range(level):
            ll, hl, lh, hh = dwt2_level_pallas_mode(a, wavelet, mode,
                                                    interpret=interpret)
            coeffs.append((hl, lh, hh))
            a = ll
        return [a] + coeffs[::-1]
    coeffs = []
    a = x
    tshape = None
    shapes = []
    F = _as_wavelet(wavelet).dec_len
    h, w = x.shape[1], x.shape[2]
    for _ in range(level):
        ll, hl, lh, hh = dwt2_level_pallas_mode(
            a, wavelet, mode, interpret=interpret,
            true_shape=tshape, padded_out=padded)
        coeffs.append((hl, lh, hh))
        a = ll
        h, w = (h + F - 1) // 2, (w + F - 1) // 2
        shapes.append((h, w))
        tshape = (h, w) if padded else None
    if padded:
        return [a] + coeffs[::-1], [shapes[-1]] + shapes[::-1]
    return [a] + coeffs[::-1]


def waverec2_pallas_mode(coeffs, wavelet: str, mode: str = "symmetric",
                         interpret: bool | None = None, threshold=None,
                         true_shapes=None):
    """Multi-level synthesis for any boundary mode; crops reconstruction
    overshoot between levels like pywt.waverec2.  ``threshold`` fuses the
    hard threshold into every stored-coefficient load (LL only at the
    coarsest level).

    ``true_shapes`` (from ``wavedec2_pallas_mode(padded=True)``): the
    subbands are tile-padded with exact zeros; each level reads only the
    true extent (which also subsumes pywt's between-level overshoot crop)
    and the result stays tile-padded — the caller crops once at the end.

    ``periodization`` uses the generic per-level loop below: aligned levels
    redirect to the direct circular kernels, ragged levels take the
    wrap-padded valid-synthesis path (between-level overshoot crop matches
    pywt.waverec2 for odd cascades)."""
    if true_shapes is not None:
        a = coeffs[0]
        first = True
        for (hl, lh, hh), tshape in zip(coeffs[1:], true_shapes[1:]):
            a = idwt2_level_pallas_mode(
                a, hl, lh, hh, wavelet, mode, interpret=interpret,
                threshold=threshold,
                threshold_ll=first and threshold is not None,
                true_shape=tuple(tshape))
            first = False
        return a
    a = coeffs[0]
    first = True
    for (hl, lh, hh) in coeffs[1:]:
        want = hl.shape
        if a.shape[1] > want[1]:
            a = jax.lax.slice_in_dim(a, 0, want[1], axis=1)
        if a.shape[2] > want[2]:
            a = jax.lax.slice_in_dim(a, 0, want[2], axis=2)
        a = idwt2_level_pallas_mode(
            a, hl, lh, hh, wavelet, mode, interpret=interpret,
            threshold=threshold,
            threshold_ll=first and threshold is not None)
        first = False
    return a
