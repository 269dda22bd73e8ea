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
_PAD = jnp.uint32(0xFFFFFFFF)  # never strictly below any candidate


def _count_kernel(cand_ref, bits_hbm, out_ref, band, acc, sem, *, nblk: int,
                  ncand: int):
    i = pl.program_id(0)
    rows = _BLK // _LANES

    def fetch(step):
        slot = jax.lax.rem(step, jnp.int32(2))
        return pltpu.make_async_copy(
            bits_hbm.at[pl.ds(step * rows, rows), :],
            band.at[slot], sem.at[slot])

    @pl.when(i == 0)
    def _():
        for c in range(ncand):
            acc[c] = jnp.int32(0)
        fetch(i).start()

    @pl.when(i + 1 < nblk)
    def _():
        fetch(i + 1).start()

    fetch(i).wait()
    blk = band[jax.lax.rem(i, jnp.int32(2))]
    for c in range(ncand):
        acc[c] += jnp.sum((blk < cand_ref[c]).astype(jnp.int32))

    @pl.when(i == nblk - 1)
    def _():
        for c in range(ncand):
            out_ref[c] = acc[c]


@functools.partial(jax.jit, static_argnames=("ncand", "interpret"))
def _count_below_padded(bits2d, cands, ncand: int, interpret: bool = False):
    nblk = bits2d.shape[0] // (_BLK // _LANES)
    kernel = functools.partial(_count_kernel, nblk=nblk, ncand=ncand)
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
            pltpu.VMEM((2, _BLK // _LANES, _LANES), jnp.uint32),
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
        flat = leaf.ravel()
        n = flat.size
        pad = (-n) % _BLK
        if pad:
            flat = jnp.concatenate(
                [flat, jnp.full((pad,), _PAD, jnp.uint32)])
        bits2d = flat.reshape(-1, _LANES)
        total = total + _count_below_padded(bits2d, cands, ncand, interpret)
    return total
