"""Pallas TPU kernel: fused SPH density over the binned slot layout.

Alternative to the XLA slab fold in ``solvers/wcsph_binned._density``. The
kernel processes one block of cells per grid step: the haloed window of
each planar field is DMA'd from HBM into VMEM once, every neighbor slab is
consumed from that VMEM copy (perfect reuse — the XLA fold re-materialises
per-slab windows), and the block's densities are written back. Grid steps
execute sequentially on the core, so HBM traffic is window-sized, not
slab-count-sized.

Layout contract: fields are [padded_cells, cap] 2D arrays (cell-major; the
host wrapper reshapes the flat slot arrays and zero-pads ``halo_cells``
rows of cells on both ends). Everything inside the kernel is 2D slices +
concats — Mosaic cannot lower 1D->2D vector reshapes.

STATUS: experimental. Correct under the Pallas interpreter (tests compare
it against the XLA fold), but the current Mosaic toolchain refuses the
cap(=32)-lane VMEM slicing this layout needs (tpu.memref_slice on
non-128-lane tiles). The XLA fold remains the production path — it already
runs at ~1.1 TFLOP/s f32, near the practical VPU ceiling — and the
lane-retiling needed to make this kernel compile is tracked in ROADMAP.md.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sph_pie_tpu.kernels import smoothing
from sph_pie_tpu.neighbors import binned as nb

BLK_CELLS = 128  # cells per kernel invocation (VMEM-bounded pair temps)


def _kernel(dim, cap, shifts, padc, blk, *refs):
    """refs: (h_smem, *field_hbm_refs, out_ref, *vmem_scratch, sem)."""
    n_fields = dim + 1  # p0..p(dim-1), mass
    h_ref = refs[0]
    field_refs = refs[1 : 1 + n_fields]
    out_ref = refs[1 + n_fields]
    scratch = refs[2 + n_fields : 2 + 2 * n_fields]
    sem = refs[2 + 2 * n_fields]
    h = h_ref[0, 0]

    i = pl.program_id(0)
    win_cells = blk + 2 * padc
    start = i * blk  # cell row into the pre-padded [padded_cells, cap] array

    # DMA the haloed window of every field into VMEM.
    for f in range(n_fields):
        pltpu.make_async_copy(
            field_refs[f].at[pl.ds(start, win_cells)], scratch[f], sem.at[f]
        ).start()
    for f in range(n_fields):
        pltpu.make_async_copy(
            field_refs[f].at[pl.ds(start, win_cells)], scratch[f], sem.at[f]
        ).wait()

    def window(ref_arr, base):
        # [blk, 3cap]: cells (c-1, c, c+1) per home cell — row slices only
        return jnp.concatenate(
            [
                ref_arr[base - 1 : base - 1 + blk],
                ref_arr[base : base + blk],
                ref_arr[base + 1 : base + 1 + blk],
            ],
            axis=1,
        )

    home = [scratch[k][padc : padc + blk] for k in range(dim)]  # [blk, cap]
    h2 = h * h
    rho = jnp.zeros((blk, cap), jnp.float32)
    for sh in shifts:
        base = padc + sh
        win = [window(scratch[k], base) for k in range(dim)]    # [blk, 3cap]
        mass_w = window(scratch[dim], base)
        r2 = jnp.zeros((blk, cap, 3 * cap), jnp.float32)
        for k in range(dim):
            d = home[k][:, :, None] - win[k][:, None, :]
            r2 = r2 + d * d
        wk = smoothing.poly6(dim, h, r2)
        rho = rho + jnp.sum(mass_w[:, None, :] * wk, axis=2)
    out_ref[:] = rho


@partial(jax.jit, static_argnames=("grid", "interpret"))
def density_pallas(params, grid: nb.BinnedGrid, b, interpret: bool = False):
    """Drop-in for wcsph_binned._density (single-device path)."""
    dim = params.dim
    cap = grid.cap
    S = grid.num_slots
    C = grid.num_cells
    padc = nb.halo_cells(grid)
    blk = BLK_CELLS
    nblk = -(-C // blk)

    def padf(x):
        cells2d = x.astype(jnp.float32).reshape(C, cap)
        return jnp.pad(cells2d, ((padc, padc + nblk * blk - C), (0, 0)))

    fields = [padf(b.pos[:, k]) for k in range(dim)] + [padf(b.mass)]
    n_fields = dim + 1
    win_cells = blk + 2 * padc
    shifts = grid.slab_shifts()

    h_arr = params.h.astype(jnp.float32).reshape(1, 1)
    out = pl.pallas_call(
        partial(_kernel, dim, cap, shifts, padc, blk),
        grid=(nblk,),
        in_specs=[pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pl.ANY)] * n_fields,
        out_specs=pl.BlockSpec(
            (blk, cap), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((nblk * blk, cap), jnp.float32),
        scratch_shapes=[pltpu.VMEM((win_cells, cap), jnp.float32)] * n_fields
        + [pltpu.SemaphoreType.DMA((n_fields,))],
        interpret=interpret,
    )(h_arr, *fields)
    rho = out.reshape(-1)[:S].astype(b.mass.dtype)
    return jnp.maximum(rho, 1e-6 * params.rest_density)
