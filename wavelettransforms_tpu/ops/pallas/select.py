"""Pallas multi-candidate count kernel for exact radix selection.

The global-percentile threshold (reference semantics: one np.percentile over
a whole coefficient array, /root/reference/ResNet/dwt_pruning.py:25-32) is
computed by a most-significant-digit radix descent on |x|'s IEEE-754 bit
patterns (parallel/quantile.py).  Each descent step needs
``count(bits < candidate)`` for several candidate prefixes.  This kernel
performs ALL candidate counts in one HBM read with double-buffered block
DMA, making the descent ~radix times cheaper in HBM traffic than XLA's
flat-form broadcast count (which lowers each candidate to its own pass).

Routing (see quantile._use_pallas_select): only leaves whose flat
(N/128, 128) view is relayout-free take this kernel; conv-shaped leaves use
the natural-layout XLA descent — retiling (O, I, 3, 3) tensors to lane
layout runs at ~4.5 GB/s and would dominate everything.

Leaves whose size is a multiple of 1024 (the (8, 128) f32 DMA tile) but not
of the 512K block are handled with a PARTIAL FINAL BLOCK inside the kernel
(smaller last DMA + masked count) — no padded HBM copy of the leaf.  Only
the tile-unaligned remainder (< 1024 elements, interpret/test paths) falls
back to pad-by-concatenate.

Counts are int32 (fine for arrays < 2^31 elements; asserted by the caller).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Elements per grid block: 512K x 4B = 2 MB (VMEM 2 slots = 4 MB).
_BLK = 512 * 1024
_LANES = 128
_TILE = 8 * _LANES  # (8, 128) f32 DMA tile
_PAD = jnp.uint32(0xFFFFFFFF)  # never strictly below any candidate


def _count_kernel(cand_ref, bits_hbm, out_ref, band, acc, sem, *, nblk: int,
                  ncand: int, rows: int, tail_rows: int):
    i = pl.program_id(0)
    ragged = tail_rows != rows

    def dmas(step):
        slot = jax.lax.rem(step, jnp.int32(2))
        full = pltpu.make_async_copy(
            bits_hbm.at[pl.ds(step * rows, rows), :],
            band.at[slot], sem.at[slot])
        if not ragged:
            return full, full
        tail = pltpu.make_async_copy(
            bits_hbm.at[pl.ds(step * rows, tail_rows), :],
            band.at[slot, pl.ds(0, tail_rows), :], sem.at[slot])
        return full, tail

    def start(step):
        full, tail = dmas(step)
        if not ragged:
            full.start()
            return

        @pl.when(step < nblk - 1)
        def _():
            full.start()

        @pl.when(step == nblk - 1)
        def _():
            tail.start()

    def wait(step):
        full, tail = dmas(step)
        if not ragged:
            full.wait()
            return

        @pl.when(step < nblk - 1)
        def _():
            full.wait()

        @pl.when(step == nblk - 1)
        def _():
            tail.wait()

    @pl.when(i == 0)
    def _():
        for c in range(ncand):
            acc[c] = jnp.int32(0)
        start(i)

    @pl.when(i + 1 < nblk)
    def _():
        start(i + 1)

    wait(i)
    blk = band[jax.lax.rem(i, jnp.int32(2))]
    if not ragged:
        for c in range(ncand):
            acc[c] += jnp.sum((blk < cand_ref[c]).astype(jnp.int32))
    else:
        # the final block's unfetched rows hold stale data — count only the
        # DMA'd region there
        @pl.when(i < nblk - 1)
        def _():
            for c in range(ncand):
                acc[c] += jnp.sum((blk < cand_ref[c]).astype(jnp.int32))

        @pl.when(i == nblk - 1)
        def _():
            part = blk[:tail_rows]
            for c in range(ncand):
                acc[c] += jnp.sum((part < cand_ref[c]).astype(jnp.int32))

    @pl.when(i == nblk - 1)
    def _():
        for c in range(ncand):
            out_ref[c] = acc[c]


@functools.partial(jax.jit, static_argnames=("ncand", "interpret"))
def _count_below_2d(bits2d, cands, ncand: int, interpret: bool = False):
    """Count kernel over any (R, C) uint32 view with C % 128 == 0 and
    R % 8 == 0 — block height adapts so each block stays ~2 MB."""
    rows_total, C = bits2d.shape
    rows = max((_BLK // C) // 8 * 8, 8)
    rows = min(rows, rows_total)  # single-block arrays shrink
    nblk = -(-rows_total // rows)
    tail_rows = rows_total - (nblk - 1) * rows
    kernel = functools.partial(_count_kernel, nblk=nblk, ncand=ncand,
                               rows=rows, tail_rows=tail_rows)
    return pl.pallas_call(
        kernel,
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((ncand,), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((2, rows, C), jnp.uint32),
            pltpu.SMEM((ncand,), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=32 * 2**20),
        interpret=interpret,
    )(cands, bits2d)


def count_below(bits_leaves, cands, interpret: bool = False):
    """sum over leaves of count(bits < c) for each candidate c.

    ``bits_leaves``: list of uint32 arrays (any shapes, flattened here) —
    counting per leaf avoids materializing a concatenated copy of all
    coefficients.  ``cands``: (C,) uint32 (traced).  Returns (C,) int32.
    """
    ncand = int(cands.shape[0])
    total = jnp.zeros((ncand,), jnp.int32)
    for leaf in bits_leaves:
        if leaf.ndim >= 2 and leaf.shape[-1] >= 256:
            # wide 2-D leaf (e.g. odd-sized wavelet subbands): keep the
            # NATURAL row-major view and sentinel-pad lanes to 128 / rows to
            # 8 — one cheap elementwise copy at most, never the ~4.5 GB/s
            # flat relayout of a ravel
            W = leaf.shape[-1]
            R = leaf.size // W
            view = leaf.reshape((R, W))
            Cp = -(-W // _LANES) * _LANES
            Rp = -(-R // 8) * 8
            if Cp != W or Rp != R:
                view = jnp.pad(view, ((0, Rp - R), (0, Cp - W)),
                               constant_values=_PAD)
            bits2d = view
        else:
            flat = leaf.ravel()
            n = flat.size
            pad = (-n) % _TILE
            if pad:
                # tile-unaligned remainder (interpret/test paths only — the
                # TPU routing gate requires size % 1024 == 0): padded copy
                flat = jnp.concatenate(
                    [flat, jnp.full((pad,), _PAD, jnp.uint32)])
            bits2d = flat.reshape(-1, _LANES)
        total = total + _count_below_2d(bits2d, cands, ncand, interpret)
    return total
