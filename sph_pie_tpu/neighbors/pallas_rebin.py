"""Pallas TPU kernel: ragged->padded expansion for the rebin hot path.

After the multi-operand sort, rebin holds K cell-sorted particle rows plus
per-cell (first, count) offsets; the dense slot layout is those rows with
each cell padded to ``cap``. XLA lowers that placement as per-column
scatters costing ~70-90 ms EACH at 1M on v5e (scatter is near-serial per
update) — ~700 ms of the round-1 rebin. This kernel does the same
expansion as per-cell VMEM block copies: grid = cell blocks; each program
DMAs its contiguous input row range once, then for every cell copies
``cap`` rows from a dynamic sublane offset and masks rows past the cell's
count. Pure copies, no scatter.

Layout: payload columns ride together as [rows, NCOL] f32 (lane dim NCOL
is narrow, but the kernel is copy-bound, not compute-bound). int32 columns
(owner) are bitcast to f32 on the way in and back on the way out.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLK = 256  # cells per program


SLACK = 4  # extra cap-rows of DMA window absorbing per-block overflow


def _kernel(cap, blk, first_ref, count_ref, rows_hbm, out_ref, scratch, sem):
    """first_ref/count_ref: [blk] 1-D SMEM blocks; rows_hbm: [K_pad, NCOL]
    ANY; out_ref: [blk*cap, NCOL] VMEM; scratch: [blk*cap +
    (SLACK+1)*cap, NCOL] VMEM. The block's input base row is
    first_ref[0] (cells are contiguous in the sorted input).

    Overflowing cells (count > cap) shift later cells' offsets past the
    blk*cap window; the slack absorbs up to SLACK*cap dropped rows per
    block, and cells beyond even that are dropped cleanly (window-bound
    mask + clamped read) rather than reading a neighbor's rows.
    """
    window = blk * cap + SLACK * cap
    base = first_ref[0]
    dma = pltpu.make_async_copy(
        rows_hbm.at[pl.ds(base, window + cap)], scratch, sem
    )
    dma.start()
    dma.wait()

    ranks = lax.broadcasted_iota(jnp.int32, (cap, 1), 0)

    def body(ci, _):
        local = jnp.minimum(first_ref[ci] - base, window)
        n = count_ref[ci]
        chunk = scratch[pl.ds(local, cap), :]
        ok = (ranks < n) & (local + ranks < window)
        out_ref[pl.ds(ci * cap, cap), :] = jnp.where(ok, chunk, 0.0)
        return 0

    lax.fori_loop(0, blk, body, 0)


@partial(jax.jit, static_argnames=("cap",))
def expand(first, count, rows, cap: int):
    """[K, NCOL] sorted rows -> [num_cells*cap, NCOL] dense padded slots.

    ``first``/``count``: [num_cells] int32 (first[c] = index of cell c's
    first sorted row). Cells with count > cap keep their first cap rows
    (identical drop semantics to the scatter path).
    """
    num_cells = first.shape[0]
    ncol = rows.shape[1]
    nblk = -(-num_cells // BLK)
    pad_cells = nblk * BLK - num_cells
    k = rows.shape[0]
    first_p = jnp.concatenate([first, jnp.full((pad_cells,), k, jnp.int32)])
    count_p = jnp.concatenate([count, jnp.zeros((pad_cells,), jnp.int32)])
    # overread guard: DMA reads blk*cap + (SLACK+1)*cap rows from `base`
    rows_pad = jnp.concatenate(
        [rows, jnp.zeros((BLK * cap + (SLACK + 1) * cap, ncol), rows.dtype)]
    )

    out = pl.pallas_call(
        partial(_kernel, cap, BLK),
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((BLK,), lambda i: (i,), memory_space=pltpu.SMEM),
            pl.BlockSpec((BLK,), lambda i: (i,), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (BLK * cap, ncol), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((nblk * BLK * cap, ncol), rows.dtype),
        scratch_shapes=[
            pltpu.VMEM((BLK * cap + (SLACK + 1) * cap, ncol), rows.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )(first_p, count_p, rows_pad)
    return out[: num_cells * cap]


def _kernel_smem_fix(*a, **k):  # pragma: no cover - placeholder for older APIs
    raise NotImplementedError
