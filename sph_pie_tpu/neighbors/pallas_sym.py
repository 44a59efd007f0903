"""Symmetric (pairs-once) Pallas TPU DENSITY kernel.

Why: the VPU roofline measured on this chip (scripts/micro_vpu.py) is
~1.1 TFLOP/s f32 and bf16 is NOT faster — the XLA slab fold already runs
at ~0.8 of that, so the only large single-chip lever left is *pair-work
volume*. Newton's third law halves it: every unordered pair is computed
once and accumulated to both sides. The XLA attempt (binned.slab_fold_sym)
measured SLOWER because XLA materialises the window-side scatter-adds as
big HBM read-modify-writes per slab; in Pallas the window-side accumulator
lives in VMEM for the whole block and is emitted once.

Only the density half lives here: it wins 1.29-1.39x over the fold at 1M
and is routed by default on TPU (wcsph_binned._use_pallas_sym). A forces
half existed through round 4 and was measured DEAD three times (0.73-0.89x
at cap 32, 0.59x at the shipped cap-40 geometry — ROADMAP ledger items 4
and 18; Mosaic's pair-op throughput plus the dual-side force deposits
lose more than pairs-once saves); it was trimmed per VERDICT r03 #9 —
see git history (scripts/micro_sym_forces.py documents the measurement).

Slab selection (vs the 3^(dim-1) one-sided slabs):
  * positive-shift slabs (4 in 3D, 1 in 2D): home cell c pairs the full
    3-cell window at c+sh-1 — the mirror pair belongs to the skipped
    negative slab;
  * one self slab: window cells c..c+1, with an upper-triangle mask on
    the c-part (within-cell pairs once, no self-pair) — lanes past cell
    c+1 in the 128-lane row are >= one whole cell away, kernel weight
    exactly 0 (free filler, as in pallas_pair).

Forward-only invariant: every positive shift is >= the smallest leading
stride (> 2 cells), so ALL window-side deposits land at rows >= the home
block start. Per (slab, block) the kernel emits a 72-row deposit span
aligned at a compile-time offset; XLA reassembles with static pad-shift
adds (body rows tile contiguously at 64 rows/block, the 8 spill rows ride
a second shifted add) — pure elementwise, no scatters.

Per-block occupancy adaptivity: an aux row carries ceil(block max cell
occupancy / 8), and the 8-rank home chunks are wrapped in pl.when — home
pair work scales with the block's real depth (rank r occupied iff cell
occupancy > r, the counting-sort invariant).

Reference behavior parity: same pair math as solvers/wcsph_binned._density
(Mueller-03 poly6), which itself mirrors the CPU/native oracles.
cap-general at cap % 8 == 0, >= 2 cells
per 128-lane row: cap 32 packs 4 cells/row exactly; cap 40 (the measured
skin-0.40 optimum, scenes/builders.py) packs 3 cells/row with 8 zero
filler lanes, which behave as empty slots (mass 0 -> zero weight).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sph_pie_tpu.neighbors import binned as nb
from sph_pie_tpu.neighbors.pallas_pair import (
    LANE,
    _class_views,
    _grid_h,
    _pack_rows,
    _poly6_c,
)

import os

# Experiment knobs (hardware A/B without code edits): home ranks per pair
# tile and whether a per-block occupancy cond wraps each rank chunk.
# Measured on v5e at 100k (density_sym vs fold): RCH=8+cond 1.02x,
# RCH=16+cond 0.72x, RCH=32 no cond 1.14x — full-cap tiles with no
# branches win; the cond's skipped work doesn't pay for its overhead at
# this block size.
RCH = int(os.environ.get("SPH_PIE_SYM_RCH", "32"))
NOCOND = os.environ.get("SPH_PIE_SYM_NOCOND", "1") == "1"
# Rows (lane-rows of 4 cells) per inner group: bounds the live pair-tile
# set to ~n_live x RG*RCH*128*4B so Mosaic register allocation stays in
# VMEM-resident working set instead of spilling (the [64, cap, 128] whole-
# block tiles measured ~0.5x XLA's per-op throughput).
RGRP = int(os.environ.get("SPH_PIE_SYM_RGRP", "8"))


def _plan_sym(grid: nb.BinnedGrid):
    """Static plan: positive-shift slabs + self slab, DMA geometry.

    cap-general: rows pack cpr = LANE//cap consecutive cells (cap 32 ->
    4 cells/128 lanes exact; cap 40 -> 3 cells/120 lanes + 8 zero-filler
    lanes that behave as empty slots). cap must be a multiple of 8
    (sublane-aligned lane slices) with at least 3 cells per row: a
    positive-shift slab's window spans cells c+sh-1 .. c+sh+1, so at
    cpr == 2 (caps 48-64) the c+sh+1 column would fall outside the
    2-cell view and its pairs would be silently dropped (ADVICE r03)."""
    cap = grid.cap
    cpr = LANE // cap
    if cap % 8 != 0 or cpr < 3:
        raise ValueError(
            "pallas sym kernels need cap % 8 == 0 and cap <= 40 "
            f"(>= 3 cells per 128-lane row), got {cap}"
        )
    shifts = tuple(grid.slab_shifts())
    reach = max(abs(s) for s in shifts)
    padc = -(-(reach + 1) // cpr) * cpr  # front pad cells, row-granular
    rows_blk = (256 // cpr // 8) * 8  # home lane-rows per program (64/80)
    blk = rows_blk * cpr  # home cells per program (256 at cap 32, 240 at 40)
    # deposit/read span: view rows reach rows_blk+1 (roff <= 1 plus the
    # next-row merge); round to the f32 sublane tile
    nr = -(-(rows_blk + 2) // 8) * 8
    C = grid.num_cells
    nblk = -(-C // blk)
    h0 = padc // cpr
    # positive slabs: window start cell c+sh-1; self slab: window start c
    slabs = []
    for sh in shifts:
        if sh > 0:
            d = sh - 1 + padc
            slabs.append((d // cpr, d % cpr, False))
    slabs.append((padc // cpr, 0, True))  # self slab last
    q_max = max(q for q, _, _ in slabs)
    n_rows = nblk * rows_blk + h0 + q_max + nr
    return {
        "cpr": cpr,
        "blk": blk,
        "padc": padc,
        "nr": nr,
        "nblk": nblk,
        "rows_blk": rows_blk,
        "h0": h0,
        "slabs": tuple(slabs),
        "n_rows": n_rows,
    }


def aux_rows(grid: nb.BinnedGrid, mass, scalars=()) -> jax.Array:
    """[nblk, 8, 128] f32 aux: lane 0 = occupancy flag, lane 1 = number of
    8-rank home chunks the block needs, lanes 8.. = traced scalars."""
    plan = _plan_sym(grid)
    nblk, blk = plan["nblk"], plan["blk"]
    cap = grid.cap
    pad = nblk * blk * cap - grid.num_slots
    m = jnp.concatenate([mass > 0, jnp.zeros((pad,), jnp.bool_)])
    occ3 = m.reshape(nblk, blk, cap)
    blk_any = jnp.any(occ3, axis=(1, 2)).astype(jnp.float32)
    blk_max = jnp.max(jnp.sum(occ3.astype(jnp.int32), axis=2), axis=1)
    nchunk = (-(-blk_max // RCH)).astype(jnp.float32)
    row = jnp.zeros((nblk, LANE), jnp.float32)
    row = row.at[:, 0].set(blk_any)
    row = row.at[:, 1].set(nchunk)
    for i, s in enumerate(scalars):
        row = row.at[:, 8 + i].set(jnp.asarray(s, jnp.float32))
    return jnp.broadcast_to(row[:, None, :], (nblk, 8, LANE))


def _deposit(contrib, a, into, roff, cap):
    """Add a [rows_blk, 128] view-class-a contribution into the span-space
    accumulator ``into`` ([nr, 128]) at row offset ``roff``.

    Inverse of _class_views: packed lane a*cap + l of row r + roff gets
    contrib[r, l] == right-roll by a*cap with the wrapped lanes carried to
    row r+1 (deposits that land on filler lanes are dropped at unpack).
    Static pad-concats instead of .at[].add (Mosaic has no scatter-add)."""
    nr = into.shape[0]

    def pad_rows(x, r0):
        parts = []
        if r0:
            parts.append(jnp.zeros((r0, LANE), x.dtype))
        parts.append(x)
        back = nr - r0 - x.shape[0]
        if back:
            parts.append(jnp.zeros((back, LANE), x.dtype))
        return jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]

    if a == 0:
        return into + pad_rows(contrib, roff)
    s = a * cap
    lane_idx = lax.broadcasted_iota(jnp.int32, contrib.shape, 1)
    rolled = pltpu.roll(contrib, s, 1)
    main = jnp.where(lane_idx >= s, rolled, 0.0)
    carry = jnp.where(lane_idx < s, rolled, 0.0)
    return into + pad_rows(main, roff) + pad_rows(carry, roff + 1)


def _tri_mask(cap, off, sz):
    """[sz, 128] bool mask for the self slab, home ranks off..off+sz: lanes
    of the home cell itself keep strictly-upper-triangle pairs; all other
    lanes pass (cell c+1 pairs once; later cells and filler lanes are
    zero-weight). Built from iotas inside the kernel (pallas_call forbids
    captured array constants)."""
    sub = lax.broadcasted_iota(jnp.int32, (sz, LANE), 0) + off
    lane = lax.broadcasted_iota(jnp.int32, (sz, LANE), 1)
    return (lane >= cap) | (sub < lane)


def _combine(plan, grid, home_part, win_parts):
    """Reassemble flat [S] results from per-block-aligned kernel outputs.

    home_part: [nblk*64, 128] rows aligned at absolute row h0.
    win_parts: list per slab of [nblk*72, 128]; rows i*72..i*72+72 of
    block i hold the deposit span starting at absolute row i*64 + q0_s.
    Split into body (64 rows -> contiguous at q0_s) + tail (8 rows ->
    contiguous at q0_s + 64): two static pad-shift adds per slab."""
    n_rows = plan["n_rows"]
    nblk = plan["nblk"]
    rows_blk = plan["rows_blk"]
    nr = plan["nr"]
    h0 = plan["h0"]
    total = nblk * rows_blk

    spill = nr - rows_blk  # deposit rows past the 64-row block body

    def shift_add(acc, rows, q0):
        # rows: [total, 128] contribution starting at absolute row q0
        front = jnp.zeros((q0, LANE), rows.dtype)
        back = jnp.zeros((n_rows - q0 - total, LANE), rows.dtype)
        return acc + jnp.concatenate([front, rows, back])

    acc = jnp.zeros((n_rows, LANE), home_part.dtype)
    acc = shift_add(acc, home_part, h0)
    for (q0, _, _), wp in zip(plan["slabs"], win_parts):
        w3 = wp.reshape(nblk, nr, LANE)
        body = w3[:, :rows_blk].reshape(total, LANE)
        tail = w3[:, rows_blk:]
        tail_full = jnp.concatenate(
            [tail, jnp.zeros((nblk, rows_blk - spill, LANE), wp.dtype)], axis=1
        ).reshape(total, LANE)
        acc = shift_add(acc, body, q0)
        acc = shift_add(acc, tail_full, q0 + rows_blk)
    row_w = plan["cpr"] * grid.cap
    flat = acc[:, :row_w].reshape(-1)  # drop filler lanes (cap 32: no-op)
    s0 = h0 * row_w
    return flat[s0 : s0 + grid.num_slots]


def _make_call(grid, plan, n_fields, n_home, n_win, kernel, interpret):
    nr, nblk = plan["nr"], plan["nblk"]
    rows_blk = plan["rows_blk"]
    n_slab = len(plan["slabs"])

    def call(packed, aux):
        home_out, win_out = pl.pallas_call(
            kernel,
            grid=(nblk,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((1, 8, LANE), lambda i: (i, 0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((n_home, rows_blk, LANE), lambda i: (0, i, 0)),
                pl.BlockSpec((n_slab * n_win, nr, LANE), lambda i: (0, i, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct(
                    (n_home, nblk * rows_blk, LANE), jnp.float32
                ),
                jax.ShapeDtypeStruct(
                    (n_slab * n_win, nblk * nr, LANE), jnp.float32
                ),
            ],
            scratch_shapes=[
                pltpu.VMEM((n_fields, rows_blk, LANE), jnp.float32),
                pltpu.VMEM((n_slab, n_fields, nr, LANE), jnp.float32),
                pltpu.SemaphoreType.DMA((n_slab + 1,)),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
            interpret=interpret,
        )(packed, aux)
        return home_out, win_out

    return call


@functools.lru_cache(maxsize=32)
def _build_density(grid: nb.BinnedGrid, interpret: bool = False):
    plan = _plan_sym(grid)
    cap = grid.cap
    dim = grid.dim
    h = _grid_h(grid)
    h2 = h * h
    coeff = _poly6_c(dim, h)
    n_fields = dim + 1  # p_k..., mass
    slabs = plan["slabs"]
    rows_blk = plan["rows_blk"]
    nr = plan["nr"]
    cpr = plan["cpr"]
    # static home-rank chunks (sizes multiples of 8; last may be ragged)
    chunks = [(o, min(RCH, cap - o)) for o in range(0, cap, RCH)]
    lane_fill = LANE - cpr * cap

    def kernel(packed_hbm, aux_ref, hout_ref, wout_ref, home_s, slab_s, sem):
        i = pl.program_id(0)
        hout_ref[0] = jnp.zeros((rows_blk, LANE), jnp.float32)
        for s in range(len(slabs)):
            wout_ref[s] = jnp.zeros((nr, LANE), jnp.float32)
        occ = aux_ref[0, 0, 0]
        n_chunks = aux_ref[0, 0, 1]

        @pl.when(occ != 0)
        def _():
            hrow0 = plan["h0"] + i * rows_blk
            pltpu.make_async_copy(
                packed_hbm.at[:, pl.ds(hrow0, rows_blk)], home_s, sem.at[0]
            ).start()
            for s, (q0, _, _) in enumerate(slabs):
                pltpu.make_async_copy(
                    packed_hbm.at[:, pl.ds(i * rows_blk + q0, nr)],
                    slab_s.at[s],
                    sem.at[1 + s],
                ).start()
            pltpu.make_async_copy(
                packed_hbm.at[:, pl.ds(hrow0, rows_blk)], home_s, sem.at[0]
            ).wait()
            homes = [
                [home_s[f][:, b * cap : (b + 1) * cap] for b in range(cpr)]
                for f in range(n_fields)
            ]
            for s, (q0, a0, is_self) in enumerate(slabs):
                pltpu.make_async_copy(
                    packed_hbm.at[:, pl.ds(i * rows_blk + q0, nr)],
                    slab_s.at[s],
                    sem.at[1 + s],
                ).wait()
                views = [
                    _class_views(slab_s[s, f], cap) for f in range(n_fields)
                ]
                wacc = jnp.zeros((nr, LANE), jnp.float32)
                rho_cls = []
                n_rg = rows_blk // RGRP
                for b in range(cpr):
                    a = (b + a0) % cpr
                    roff = (b + a0) // cpr
                    rho_rg, wd_rg = [], []
                    for rg in range(n_rg):
                        r0 = rg * RGRP
                        win = [
                            views[f][a][roff + r0 : roff + r0 + RGRP][
                                :, None, :
                            ]
                            for f in range(n_fields)
                        ]
                        rho_rc = []
                        wdep = jnp.zeros((RGRP, LANE), jnp.float32)
                        for ci, (coff, csz) in enumerate(chunks):

                            def chunk(coff=coff, csz=csz, b=b, win=win, r0=r0):
                                r2 = jnp.zeros(
                                    (RGRP, csz, LANE), jnp.float32
                                )
                                for k in range(dim):
                                    hm = homes[k][b][
                                        r0 : r0 + RGRP,
                                        coff : coff + csz,
                                    ]
                                    d = hm[:, :, None] - win[k]
                                    r2 = r2 + d * d
                                q = jnp.maximum(h2 - r2, 0.0)
                                wk = (coeff * q) * q * q
                                if is_self:
                                    wk = jnp.where(
                                        _tri_mask(cap, coff, csz)[None],
                                        wk,
                                        0.0,
                                    )
                                m_h = homes[dim][b][
                                    r0 : r0 + RGRP,
                                    coff : coff + csz,
                                ]
                                rho_c = jnp.sum(win[dim] * wk, axis=2)
                                wd = jnp.sum(m_h[:, :, None] * wk, axis=1)
                                return rho_c, wd

                            # occupancy-adaptive: ranks past the block max
                            # are empty by the counting-sort invariant
                            zero_rc = (
                                jnp.zeros((RGRP, csz), jnp.float32),
                                jnp.zeros((RGRP, LANE), jnp.float32),
                            )
                            if NOCOND:
                                rho_c, wd = chunk()
                            else:
                                rho_c, wd = lax.cond(
                                    ci < n_chunks, chunk, lambda: zero_rc
                                )
                            rho_rc.append(rho_c)
                            wdep = wdep + wd
                        rho_rg.append(jnp.concatenate(rho_rc, axis=1))
                        wd_rg.append(wdep)
                    rho_cls.append(jnp.concatenate(rho_rg, axis=0))
                    wacc = _deposit(
                        jnp.concatenate(wd_rg, axis=0), a, wacc, roff, cap
                    )
                hcat = jnp.concatenate(rho_cls, axis=1)
                if lane_fill:
                    hcat = jnp.concatenate(
                        [hcat, jnp.zeros((rows_blk, lane_fill), jnp.float32)],
                        axis=1,
                    )
                hout_ref[0] = hout_ref[0] + hcat
                wout_ref[s] = wacc

    return plan, _make_call(grid, plan, n_fields, 1, 1, kernel, interpret)


def density_sym(params, grid: nb.BinnedGrid, b, interpret: bool = False):
    """Drop-in for wcsph_binned._density (single device).

    Pairs computed once; the W(0) self term rides an elementwise pass.
    Supports grid caps {8, 16, 24, 32, 40} only (cap % 8 == 0 and
    >= 3 cells per 128-lane row — see _plan_sym); raises otherwise."""
    plan, fn = _build_density(grid, interpret)
    cols = [b.pos[:, k] for k in range(grid.dim)] + [b.mass]
    packed = _pack_rows(grid, plan, cols)
    hout, wout = fn(packed, aux_rows(grid, b.mass))
    rho = _combine(plan, grid, hout[0], [wout[s] for s in range(len(plan["slabs"]))])
    h = _grid_h(grid)
    w0 = _poly6_c(grid.dim, h) * h**6
    rho = (rho + b.mass * w0).astype(b.mass.dtype)
    rho = jnp.where(b.valid, rho, 0.0)
    return jnp.maximum(rho, 1e-6 * params.rest_density)

