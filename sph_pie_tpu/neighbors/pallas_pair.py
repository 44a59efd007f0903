"""Pallas TPU fused pair kernel — 128-lane retiled density.

Round 1's prototype kept cap(=32) on the lane axis, which this Mosaic
toolchain rejects (non-128-lane VMEM ref slicing). The retiling that
works, per a feature bisect on the real chip (manual DMA with dynamic
offsets OK; dynamic sublane slices OK; 1-D/small SMEM block specs NOT OK):

  * A home cell c pairs against window cells (w .. w+3), w = c + sh - 1:
    with cap = 32 that is 128 contiguous slots = one exact VPU lane tile.
    The 4th cell sits entirely beyond the 3-cell stencil, so every kernel
    weight on it is exactly 0 — free lane filler, not error (the XLA fold
    pays the same 128 lanes for its 96 useful ones via padding).
  * Window tensors come from 4 ALIGNMENT-CLASS views of the flat slot
    window: view_a = the window shifted by a*cap slots, as [rows, 128].
    The shift crosses lane-row boundaries, so each view is built once per
    block from two pltpu.rolls + a lane select; after that every
    (slab, class) window is a STATIC row slice — zero gathers.
  * The pair tile per (slab, class) is [BLK/4, cap, 128], home slots
    broadcast over lanes, window rows over sublanes — native VPU shapes,
    VMEM-resident end to end (the XLA fold re-materialises its slab
    windows through HBM on every pass).

All VMEM *ref* accesses are full-lane [*, 128]; sub-128 shapes only ever
appear as register values (broadcast operands), which Mosaic handles.
"""

from __future__ import annotations

import functools
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sph_pie_tpu.kernels import smoothing
from sph_pie_tpu.neighbors import binned as nb

LANE = 128
BLK = 256  # home cells per program -> blk*cap/LANE = 64 output lane-rows


def _class_views(x2d, vrows):
    """views[a][r, l] == flat[a*32 + r*128 + l], a = 0..3 (cap == 32)."""
    lane_idx = lax.broadcasted_iota(jnp.int32, x2d.shape, 1)
    x_down = jnp.concatenate([x2d[1:], jnp.zeros_like(x2d[:1])], axis=0)
    views = [x2d[:vrows]]
    for a in (1, 2, 3):
        s = a * 32
        xs = pltpu.roll(x2d, -s, 1)
        xn = pltpu.roll(x_down, -s, 1)
        views.append(jnp.where(lane_idx < LANE - s, xs, xn)[:vrows])
    return views


@functools.lru_cache(maxsize=32)
def _build_density(grid: nb.BinnedGrid, h: float, dim: int):
    if grid.cap != 32:
        raise ValueError(f"pallas pair kernel requires cap == 32, got {grid.cap}")
    cap = grid.cap
    C = grid.num_cells
    shifts = tuple(grid.slab_shifts())
    reach = max(abs(s) for s in shifts)
    padc = -(-(reach + 6) // 4) * 4           # lane-aligned halo, >= reach+6
    win_cells = BLK + 2 * padc                # multiple of 4
    win_rows = win_cells * cap // LANE
    vrows = win_rows - 1
    nblk = -(-C // BLK)
    h2 = h * h
    coeff = smoothing.poly6_coeff(dim, h)
    n_fields = dim + 1                        # p_k ..., mass
    out_rows_blk = BLK * cap // LANE          # 64
    Sp_rows = nblk * out_rows_blk
    hr0 = padc * cap // LANE                  # home region start row

    def kernel(*refs):
        field_hbm = refs[:n_fields]
        out_ref = refs[n_fields]
        scratch = refs[n_fields + 1 : 1 + 2 * n_fields]
        sem = refs[1 + 2 * n_fields]

        i = pl.program_id(0)
        row0 = i * out_rows_blk
        for f in range(n_fields):
            pltpu.make_async_copy(
                field_hbm[f].at[pl.ds(row0, win_rows)], scratch[f], sem.at[f]
            ).start()
        for f in range(n_fields):
            pltpu.make_async_copy(
                field_hbm[f].at[pl.ds(row0, win_rows)], scratch[f], sem.at[f]
            ).wait()

        views = [_class_views(scratch[f][:], vrows) for f in range(n_fields)]
        # home slots as [BLK//4, 4, cap] (cells x class x rank)
        homes = [
            scratch[f][hr0 : hr0 + out_rows_blk, :].reshape(BLK // 4, 4, cap)
            for f in range(dim)
        ]

        rho_b = [jnp.zeros((BLK // 4, cap), jnp.float32) for _ in range(4)]
        for sh in shifts:
            for a in range(4):
                b = (a - padc - sh + 1) % 4
                r0 = (padc + b + sh - 1 - a) // 4
                win_p = [
                    views[f][a][r0 : r0 + BLK // 4][:, None, :]
                    for f in range(n_fields)
                ]
                r2 = jnp.zeros((BLK // 4, cap, LANE), jnp.float32)
                for k in range(dim):
                    d = homes[k][:, b, :][:, :, None] - win_p[k]
                    r2 = r2 + d * d
                q = jnp.maximum(h2 - r2, 0.0)
                wk = (coeff * q) * q * q
                rho_b[b] = rho_b[b] + jnp.sum(win_p[dim] * wk, axis=2)
        rho = jnp.stack(rho_b, axis=1)        # [BLK//4, 4, cap]
        out_ref[:] = rho.reshape(out_rows_blk, LANE)

    @jax.jit
    def density_fn(pos, mass):
        def as_rows(x):
            flat = x.astype(jnp.float32)
            front = jnp.zeros((padc * cap,), jnp.float32)
            back = jnp.zeros(
                ((nblk * BLK - C) * cap + padc * cap + LANE,), jnp.float32
            )
            full = jnp.concatenate([front, flat, back])
            n_rows = Sp_rows + 2 * hr0 + 1
            return full[: n_rows * LANE].reshape(n_rows, LANE)

        fields = [as_rows(pos[:, k]) for k in range(dim)] + [as_rows(mass)]
        out = pl.pallas_call(
            kernel,
            grid=(nblk,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * n_fields,
            out_specs=pl.BlockSpec(
                (out_rows_blk, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((Sp_rows, LANE), jnp.float32),
            scratch_shapes=[pltpu.VMEM((win_rows, LANE), jnp.float32)]
            * n_fields
            + [pltpu.SemaphoreType.DMA((n_fields,))],
        )(*fields)
        return out.reshape(-1)[: grid.num_slots].astype(mass.dtype)

    return density_fn


def density_pallas(params, grid: nb.BinnedGrid, b):
    """Drop-in for wcsph_binned._density (single device, cap == 32).

    Self term is included (the home cell is inside its own window)."""
    fn = _build_density(grid, float(params.h), grid.dim)
    rho = fn(b.pos, b.mass)
    rho = jnp.where(b.valid, rho, 0.0)
    return jnp.maximum(rho, 1e-6 * params.rest_density)
