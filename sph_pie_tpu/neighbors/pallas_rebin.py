"""Pallas TPU kernel: ragged->padded expansion for the rebin hot path.

After the multi-operand sort, rebin holds K cell-sorted particle rows plus
per-cell (first, count) offsets; the dense slot layout is those rows with
each cell padded to ``cap``. XLA lowers that placement as per-column
scalar scatters — the rebin is bound by HBM transaction count (~7 ns per
scalar update; the 2026-08 decomposition in scripts/micro_rebin2.py puts
the 9-column scatter side at 61.5 ms standalone at 1M and measured the
scatter hints and complex64 pair-packing DEAD). This kernel does the same
placement as per-cell VMEM block copies: grid = cell blocks; each program
DMAs its contiguous input row range once, then for every cell copies
``cap`` rows from a dynamic sublane offset and masks rows past the cell's
count. Pure copies, no scatter — and the dense zero-init (a full 9-column
[S] materialisation, ~10 ms at 1M) comes free in the mask.

Layout: payload columns ride together as [rows, NCOL] f32, lane-padded to
128 before the pallas_call. The pad moves no extra physical bytes — the
(1,128) HBM tiling already stores one row per 128-lane tile — but it makes
the dynamic dim-0 DMA slice legal (Mosaic rejects a lane-dim slice that is
not 128-aligned: "Slice shape along dimension 1 must be aligned to tiling
(128), but is 9", first hardware compile 2026-08-19). int32 columns
(owner) are bitcast to f32 on the way in and back on the way out.

History (hardware compile attempts, 2026-08-19): a round-2 version used
1-D per-block SMEM BlockSpecs for (first, count) — rejected by Mosaic; a
scalar-prefetch (PrefetchScalarGridSpec) version compiled past that but
blew the 1 MB SMEM budget, since prefetch copies the FULL arrays to SMEM
(268k cells x int32 = 1.07 MB each at 1M particles). This version uses
2-D ``(1, BLK)`` per-block SMEM blocks: 512 B per operand per program.

Reference behavior parity: identical drop semantics to the scatter path
for count <= cap + per-block slack; cells whose rows land beyond the
block's DMA window (pathological overflow > SLACK*cap rows in one block)
are zero-filled rather than garbage-filled. The overflow counter in
_bin_rows is computed outside either path.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLK = 128  # cells per program (block + scratch must fit VMEM at 128 lanes)

LANE = 128  # lane-dim pad so HBM DMA slices are tile-aligned


SLACK = 4  # extra cap-rows of DMA window absorbing per-block overflow


def _kernel(cap, blk, first_ref, count_ref, rows_hbm, out_ref, scratch, sem):
    """first_ref/count_ref: [1, blk] int32 SMEM blocks (2-D: Mosaic rejects
    1-D SMEM specs, and full-array scalar prefetch blows the 1 MB SMEM at
    268k cells — both measured 2026-08-19); rows_hbm: [K_pad, 128] ANY;
    out_ref: [blk*cap, 128] VMEM; scratch: [blk*cap + (SLACK+1)*cap, 128]
    VMEM. The block's input base row is first_ref[0, 0] (cells are
    contiguous in the sorted input).

    Overflowing cells (count > cap) shift later cells' offsets past the
    blk*cap window; the slack absorbs up to SLACK*cap dropped rows per
    block, and cells beyond even that are dropped cleanly (window-bound
    mask + clamped read) rather than reading a neighbor's rows.
    """
    window = blk * cap + SLACK * cap
    base = first_ref[0, 0]
    dma = pltpu.make_async_copy(
        rows_hbm.at[pl.ds(base, window + cap)], scratch, sem
    )
    dma.start()
    dma.wait()

    ranks = lax.broadcasted_iota(jnp.int32, (cap, 1), 0)

    def body(ci, _):
        local = jnp.minimum(first_ref[0, ci] - base, window)
        n = count_ref[0, ci]
        chunk = scratch[pl.ds(local, cap), :]
        ok = (ranks < n) & (local + ranks < window)
        out_ref[pl.ds(ci * cap, cap), :] = jnp.where(ok, chunk, 0.0)
        return 0

    lax.fori_loop(0, blk, body, 0)


@partial(jax.jit, static_argnames=("cap", "interpret"))
def expand(first, count, rows, cap: int, interpret: bool = False):
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
    # overread guard: DMA reads blk*cap + (SLACK+1)*cap rows from `base`;
    # lane-pad to 128 (physically free under (1,128) tiling, required for
    # the dynamic dim-0 HBM slice — see module docstring)
    rows_pad = jnp.concatenate(
        [rows, jnp.zeros((BLK * cap + (SLACK + 1) * cap, ncol), rows.dtype)]
    )
    rows_pad = jnp.pad(rows_pad, ((0, 0), (0, LANE - ncol)))

    kw = {"interpret": True} if interpret else {}
    out = pl.pallas_call(
        partial(_kernel, cap, BLK),
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((1, BLK), lambda i: (0, i), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, BLK), lambda i: (0, i), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((BLK * cap, LANE), lambda i: (i, 0)),
        scratch_shapes=[
            pltpu.VMEM((BLK * cap + (SLACK + 1) * cap, LANE), rows.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        out_shape=jax.ShapeDtypeStruct((nblk * BLK * cap, LANE), rows.dtype),
        **kw,
    )(first_p[None], count_p[None], rows_pad)
    return out[: num_cells * cap, :ncol]
