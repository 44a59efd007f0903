"""Pallas TPU fused pair kernels — per-slab DMA windows, 128-lane classes.

Design (v2 — the v1 single-window kernel VMEM-OOM'd: its scratch spanned
the full slab reach, i.e. two whole grid planes ≈ 45 MB):

  * A home cell c pairs against window cells (w .. w+3), w = c + sh - 1:
    with cap = 32 that is 128 contiguous slots = one exact VPU lane tile.
    The 4th cell sits entirely beyond the 3-cell stencil, so every kernel
    weight on it is exactly 0 — free lane filler, not error.
  * Per home block of BLK cells, each of the 3^(dim-1) slabs needs only a
    (BLK + ~6)-cell span of the flat slot array. Each span is DMA'd
    separately (one strided copy over all fields), so VMEM holds
    9 x 72 rows instead of the full inter-slab reach (two grid planes).
    This also cuts HBM traffic ~9x vs the XLA fold, whose per-block
    dynamic-slice window must span the full reach.
  * Window tensors come from 4 ALIGNMENT-CLASS views of each slab span:
    view_a = the span left-rotated by a*cap slots, as [rows, 128]. Built
    once per (slab, field) from two pltpu.rolls + a lane select; after
    that every class window is a STATIC row slice — zero gathers.
  * The pair tile per (slab, class) is [BLK/4, cap, 128], home slots
    broadcast over lanes, window rows over sublanes — native VPU shapes,
    VMEM-resident end to end.
  * Dynamic FluidParams coefficients (viscosity, surface tension) never
    enter the kernel: the forces kernel emits separate per-term
    reductions (pressure / viscosity / cohesion / xsph) that XLA combines
    with the traced coefficients outside. Only the support radius h is
    baked in, and h is static grid geometry (cell_size - skin).
  * Empty home blocks (the settled-fluid prefix trick — see
    neighbors/binned.py) are skipped via a per-block occupancy flag read
    from a VMEM row; skipped blocks write zeros and issue no DMAs.

Mosaic toolchain constraints honoured (feature-bisected on v5e):
no reshapes that split/merge the lane axis, no sub-128-lane VMEM ref
slicing (lane concats of register values instead), no small SMEM block
specs (flags ride a [1, 128] VMEM row), non-negative pltpu.roll shifts.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sph_pie_tpu.neighbors import binned as nb

LANE = 128
BLK = 256  # home cells per program -> BLK*cap/LANE = 64 output lane-rows
RCH = 8    # home ranks per pair tile (bounds the Mosaic vector stack)


def _grid_h(grid: nb.BinnedGrid) -> float:
    """Support radius from static grid geometry (cell = h + skin)."""
    return float(grid.cell_size - grid.skin)


def _plan(grid: nb.BinnedGrid):
    """Static DMA plan: front pad, per-slab (row offset, class offset)."""
    if grid.cap != 32:
        raise ValueError(f"pallas pair kernels require cap == 32, got {grid.cap}")
    shifts = tuple(grid.slab_shifts())
    reach = max(abs(s) for s in shifts)
    padc = -(-(reach + 1) // 4) * 4  # front pad cells, multiple of 4
    # span: local window cells reach 4*(BLK/4-1) + 3 + a0(<=3) + 3, plus one
    # row (4 cells) of roll-peek slack -> (BLK + 6)/4 + 2 rows, sublane-pad
    nr = -(-(BLK + 6 + 4) // 4)
    nr = -(-nr // 8) * 8  # f32 sublane tile
    C = grid.num_cells
    nblk = -(-C // BLK)
    rows_blk = BLK * grid.cap // LANE  # 64
    h0 = padc * grid.cap // LANE       # front pad rows
    slabs = []
    for sh in shifts:
        d = sh - 1 + padc
        slabs.append((d // 4, d % 4))  # (q0 row offset, a0 class offset)
    q_max = max(q for q, _ in slabs)
    n_rows = nblk * rows_blk + h0 + q_max + nr
    return {
        "shifts": shifts,
        "padc": padc,
        "nr": nr,
        "nblk": nblk,
        "rows_blk": rows_blk,
        "h0": h0,
        "slabs": tuple(slabs),
        "n_rows": n_rows,
    }


def _class_views(x2d, cap):
    """views[a][r, l] == row-packed span shifted left by a cells: lane l of
    view a reads packed lane (a*cap + l) of the same row, wrapping into row
    r+1. One view per cell class a = 0..LANE//cap - 1."""
    lane_idx = lax.broadcasted_iota(jnp.int32, x2d.shape, 1)
    x_down = jnp.concatenate([x2d[1:], jnp.zeros_like(x2d[:1])], axis=0)
    views = [x2d]
    for a in range(1, LANE // cap):
        s = a * cap
        # left-roll by s == right-roll by LANE - s (pltpu.roll rejects
        # negative shifts on this jax)
        xs = pltpu.roll(x2d, LANE - s, 1)
        xn = pltpu.roll(x_down, LANE - s, 1)
        views.append(jnp.where(lane_idx < LANE - s, xs, xn))
    return views


def _pack_rows(grid: nb.BinnedGrid, plan, cols):
    """[S] flat fields -> one [F, n_rows, 128] HBM array (f32).

    Each row packs cpr = LANE//cap consecutive cells at lane stride cap;
    when cap*cpr < LANE (cap 40: 3 cells = 120 lanes) the trailing lanes
    of every row are zero filler — indistinguishable from empty slots
    (mass 0 at the origin), which every pair kernel already treats as
    exactly zero weight. cap 32 degenerates to the plain [.., 128]
    reshape (row width == LANE, no filler)."""
    cap = grid.cap
    cpr = LANE // cap
    row_w = cpr * cap
    front = plan["padc"] * cap
    total = plan["n_rows"] * row_w
    out = []
    for c in cols:
        flat = c.astype(jnp.float32)
        back = total - front - flat.shape[0]
        x = jnp.concatenate(
            [
                jnp.zeros((front,), jnp.float32),
                flat,
                jnp.zeros((back,), jnp.float32),
            ]
        ).reshape(plan["n_rows"], row_w)
        if row_w < LANE:
            x = jnp.pad(x, ((0, 0), (0, LANE - row_w)))
        out.append(x)
    return jnp.stack(out, axis=0)


def block_flags(grid: nb.BinnedGrid, mass) -> jax.Array:
    """[nblk, 128] int32: per-home-block occupancy (0 = skip the block)."""
    plan = _plan(grid)
    nblk = plan["nblk"]
    pad = nblk * BLK * grid.cap - grid.num_slots
    m = jnp.concatenate([mass > 0, jnp.zeros((pad,), jnp.bool_)])
    occ = jnp.any(m.reshape(nblk, BLK * grid.cap), axis=1).astype(jnp.int32)
    # [nblk, 8, 128]: Mosaic block specs need the last two dims (8, 128)
    return jnp.broadcast_to(occ[:, None, None], (nblk, 8, LANE))


def _poly6_c(dim, h):
    import math

    return (
        4.0 / (math.pi * h**8)
        if dim == 2
        else 315.0 / (64.0 * math.pi * h**9)
    )


def _spiky_c(dim, h):
    import math

    return (
        -30.0 / (math.pi * h**5) if dim == 2 else -45.0 / (math.pi * h**6)
    )


def _visc_c(dim, h):
    import math

    return 40.0 / (math.pi * h**5) if dim == 2 else 45.0 / (math.pi * h**6)


def _make_pair_call(grid, plan, n_fields, n_out, kernel, interpret=False):
    """Shared pallas_call builder: packed fields + flags -> [n_out, S]."""
    nr, nblk = plan["nr"], plan["nblk"]
    rows_blk = plan["rows_blk"]
    sp_rows = nblk * rows_blk

    def call(packed, flags):
        out = pl.pallas_call(
            kernel,
            grid=(nblk,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((1, 8, LANE), lambda i: (i, 0, 0)),
            ],
            out_specs=pl.BlockSpec(
                (n_out, rows_blk, LANE),
                lambda i: (0, i, 0),
            ),
            out_shape=jax.ShapeDtypeStruct((n_out, sp_rows, LANE), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((n_fields, rows_blk, LANE), jnp.float32),  # home
                pltpu.VMEM(
                    (len(plan["slabs"]), n_fields, nr, LANE), jnp.float32
                ),
                pltpu.SemaphoreType.DMA((len(plan["slabs"]) + 1,)),
            ],
            # the unrolled slab x class x rank-chunk loop defeats Mosaic's
            # default 16 MB scoped-vmem stack accounting; v5e has 128 MB
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
            interpret=interpret,
        )(packed, flags)
        return out.reshape(n_out, sp_rows * LANE)[:, : grid.num_slots]

    return call


@functools.lru_cache(maxsize=32)
def _build_density(grid: nb.BinnedGrid, interpret: bool = False):
    plan = _plan(grid)
    cap = grid.cap
    dim = grid.dim
    h = _grid_h(grid)
    h2 = h * h
    coeff = _poly6_c(dim, h)
    n_fields = dim + 1  # p_k..., mass
    slabs = plan["slabs"]
    rows_blk = plan["rows_blk"]
    nr = plan["nr"]

    def kernel(packed_hbm, flags_ref, out_ref, home_s, slab_s, sem):
        i = pl.program_id(0)
        out_ref[0] = jnp.zeros((rows_blk, LANE), jnp.float32)
        occ = flags_ref[0, 0, 0]

        @pl.when(occ != 0)
        def _():
            hrow0 = plan["h0"] + i * rows_blk
            pltpu.make_async_copy(
                packed_hbm.at[:, pl.ds(hrow0, rows_blk)], home_s, sem.at[0]
            ).start()
            for s, (q0, _) in enumerate(slabs):
                pltpu.make_async_copy(
                    packed_hbm.at[:, pl.ds(i * rows_blk + q0, nr)],
                    slab_s.at[s],
                    sem.at[1 + s],
                ).start()
            pltpu.make_async_copy(
                packed_hbm.at[:, pl.ds(hrow0, rows_blk)], home_s, sem.at[0]
            ).wait()
            # full-lane ref loads, then value-land lane slices (Mosaic
            # rejects sub-128-lane VMEM ref slicing)
            homes = [
                [home_s[f][:, b * cap : (b + 1) * cap] for b in range(4)]
                for f in range(dim)
            ]
            # rank chunks of RCH keep the pair tiles [rows, RCH, 128]
            # small: the Mosaic vector stack for full-cap tiles blew the
            # 16 MB scoped-vmem limit (measured 20.75 MB at 1M)
            rho_b = [
                [jnp.zeros((rows_blk, RCH), jnp.float32) for _ in range(cap // RCH)]
                for _ in range(4)
            ]
            for s, (q0, a0) in enumerate(slabs):
                pltpu.make_async_copy(
                    packed_hbm.at[:, pl.ds(i * rows_blk + q0, nr)],
                    slab_s.at[s],
                    sem.at[1 + s],
                ).wait()
                views = [_class_views(slab_s[s, f], cap) for f in range(n_fields)]
                for b in range(4):
                    a = (b + a0) % 4
                    roff = (b + a0) // 4
                    win = [
                        views[f][a][roff : roff + rows_blk][:, None, :]
                        for f in range(n_fields)
                    ]
                    for rc in range(cap // RCH):
                        r2 = jnp.zeros((rows_blk, RCH, LANE), jnp.float32)
                        for k in range(dim):
                            hm = homes[k][b][:, rc * RCH : (rc + 1) * RCH]
                            d = hm[:, :, None] - win[k]
                            r2 = r2 + d * d
                        q = jnp.maximum(h2 - r2, 0.0)
                        wk = (coeff * q) * q * q
                        rho_b[b][rc] = rho_b[b][rc] + jnp.sum(
                            win[dim] * wk, axis=2
                        )
            out_ref[0] = jnp.concatenate(
                [c for b in range(4) for c in rho_b[b]], axis=1
            )

    return plan, _make_pair_call(grid, plan, n_fields, 1, kernel, interpret)


def density_pallas(params, grid: nb.BinnedGrid, b, interpret: bool = False):
    """Drop-in for wcsph_binned._density (single device, cap == 32).

    Self term is included (the home cell is inside its own window)."""
    plan, fn = _build_density(grid, interpret)
    cols = [b.pos[:, k] for k in range(grid.dim)] + [b.mass]
    packed = _pack_rows(grid, plan, cols)
    rho = fn(packed, block_flags(grid, b.mass))[0].astype(b.mass.dtype)
    # Empty slots sit at pos 0 and pick up spurious density from real
    # particles near bound_min; mask before the floor, matching the fold
    # and density_sym this kernel is a drop-in for.
    rho = jnp.where(b.valid, rho, 0.0)
    return jnp.maximum(rho, 1e-6 * params.rest_density)


@functools.lru_cache(maxsize=32)
def _build_forces(
    grid: nb.BinnedGrid,
    use_cohesion: bool,
    use_xsph: bool,
    interpret: bool = False,
):
    """Forces kernel: per-term reductions with NO dynamic coefficients.

    Fields (packed order): p_k..., v_k..., mass, pr2, m_rho.
    Outputs per dim k:
      P_k = sum_j m_j (pr2_i + pr2_j) gw  * d_k / r        (pressure)
      V_k = sum_j (m/rho)_j lapW * (v_j - v_i)_k           (viscosity core)
      C_k = sum_j m_j coh * d_k / r                        (cohesion)
      X_k = sum_j (m/rho)_j W * (v_j - v_i)_k              (xsph core)
    XLA combines outside: acc = -(P + st*C) + mu*inv_rho_i*V; xsph = X.
    """
    plan = _plan(grid)
    cap = grid.cap
    dim = grid.dim
    h = _grid_h(grid)
    h2 = h * h
    c_spiky = _spiky_c(dim, h)
    c_visc = _visc_c(dim, h)
    c_poly6 = _poly6_c(dim, h)
    import math

    c_coh = 32.0 / (math.pi * h ** (9 if dim == 3 else 8))
    h6_64 = h**6 / 64.0
    F_MASS, F_PR2, F_MRHO = 2 * dim, 2 * dim + 1, 2 * dim + 2
    n_fields = 2 * dim + 3  # p_k, v_k, mass, pr2, m_rho
    terms = 2 + (1 if use_cohesion else 0) + (1 if use_xsph else 0)
    n_out = terms * dim
    slabs = plan["slabs"]
    rows_blk = plan["rows_blk"]
    nr = plan["nr"]
    tiny = 1e-12

    def kernel(packed_hbm, flags_ref, out_ref, home_s, slab_s, sem):
        i = pl.program_id(0)
        for j in range(n_out):
            out_ref[j] = jnp.zeros((rows_blk, LANE), jnp.float32)
        occ = flags_ref[0, 0, 0]

        @pl.when(occ != 0)
        def _():
            hrow0 = plan["h0"] + i * rows_blk
            pltpu.make_async_copy(
                packed_hbm.at[:, pl.ds(hrow0, rows_blk)], home_s, sem.at[0]
            ).start()
            for s, (q0, _) in enumerate(slabs):
                pltpu.make_async_copy(
                    packed_hbm.at[:, pl.ds(i * rows_blk + q0, nr)],
                    slab_s.at[s],
                    sem.at[1 + s],
                ).start()
            pltpu.make_async_copy(
                packed_hbm.at[:, pl.ds(hrow0, rows_blk)], home_s, sem.at[0]
            ).wait()

            def hslice(f, bcls):
                # full-lane ref load, then value-land lane slice
                return home_s[f][:, bcls * cap : (bcls + 1) * cap]

            # accumulators per (term, dim, class, rank-chunk): [rows, RCH]
            nrc = cap // RCH
            zeros = jnp.zeros((rows_blk, RCH), jnp.float32)
            acc = [
                [[[zeros] * nrc for _ in range(4)] for _ in range(dim)]
                for _ in range(terms)
            ]

            for s, (q0, a0) in enumerate(slabs):
                pltpu.make_async_copy(
                    packed_hbm.at[:, pl.ds(i * rows_blk + q0, nr)],
                    slab_s.at[s],
                    sem.at[1 + s],
                ).wait()
                views = [
                    _class_views(slab_s[s, f], cap) for f in range(n_fields)
                ]
                for bcls in range(4):
                    a = (bcls + a0) % 4
                    roff = (bcls + a0) // 4

                    def win(f):
                        return views[f][a][roff : roff + rows_blk][:, None, :]

                    for rc in range(nrc):

                        def hm(f):
                            return hslice(f, bcls)[:, rc * RCH : (rc + 1) * RCH][
                                :, :, None
                            ]

                        d = []
                        r2 = jnp.zeros((rows_blk, RCH, LANE), jnp.float32)
                        for k in range(dim):
                            dk = hm(k) - win(k)
                            d.append(dk)
                            r2 = r2 + dk * dk
                        inv_r = lax.rsqrt(jnp.maximum(r2, tiny))
                        r = r2 * inv_r
                        qs = jnp.maximum(h - r, 0.0)
                        gw = c_spiky * qs * qs
                        m_j = win(F_MASS)
                        p_term = hm(F_PR2) + win(F_PR2)
                        press = (m_j * p_term) * (gw * inv_r)
                        lap = c_visc * qs
                        visc_w = win(F_MRHO) * lap
                        if use_cohesion:
                            hr3 = qs * qs * qs
                            r3 = r2 * r
                            prod = hr3 * r3
                            cval = jnp.where(
                                r <= 0.5 * h, 2.0 * prod - h6_64, prod
                            )
                            coh = jnp.where(
                                (r > 0.0) & (r < h), c_coh * cval, 0.0
                            )
                            coh_w = (m_j * coh) * inv_r
                        if use_xsph:
                            qp = jnp.maximum(h2 - r2, 0.0)
                            wk = (c_poly6 * qp) * qp * qp
                            xw = win(F_MRHO) * wk
                        for k in range(dim):
                            dv = win(dim + k) - hm(dim + k)
                            t = 0
                            acc[t][k][bcls][rc] = acc[t][k][bcls][rc] + jnp.sum(
                                press * d[k], axis=2
                            )
                            t += 1
                            acc[t][k][bcls][rc] = acc[t][k][bcls][rc] + jnp.sum(
                                visc_w * dv, axis=2
                            )
                            t += 1
                            if use_cohesion:
                                acc[t][k][bcls][rc] = acc[t][k][bcls][
                                    rc
                                ] + jnp.sum(coh_w * d[k], axis=2)
                                t += 1
                            if use_xsph:
                                acc[t][k][bcls][rc] = acc[t][k][bcls][
                                    rc
                                ] + jnp.sum(xw * dv, axis=2)
            for t in range(terms):
                for k in range(dim):
                    out_ref[t * dim + k] = jnp.concatenate(
                        [c for bcls in range(4) for c in acc[t][k][bcls]],
                        axis=1,
                    )

    return plan, _make_pair_call(grid, plan, n_fields, n_out, kernel, interpret), terms


def forces_pallas(params, grid: nb.BinnedGrid, b, interpret: bool = False):
    """Drop-in for wcsph_binned._forces (single device, cap == 32)."""
    use_coh = bool(params.use_cohesion)
    use_x = bool(params.use_xsph)
    plan, fn, terms = _build_forces(grid, use_coh, use_x, interpret)
    dim = grid.dim
    inv_rho = 1.0 / b.density
    pr2 = b.pressure * inv_rho * inv_rho
    m_rho = b.mass * inv_rho
    cols = (
        [b.pos[:, k] for k in range(dim)]
        + [b.vel[:, k] for k in range(dim)]
        + [b.mass, pr2, m_rho]
    )
    packed = _pack_rows(grid, plan, cols)
    out = fn(packed, block_flags(grid, b.mass)).astype(b.mass.dtype)
    press = out[0:dim]
    visc = out[dim : 2 * dim]
    t = 2
    radial = press
    if use_coh:
        radial = radial + params.surface_tension * out[t * dim : (t + 1) * dim]
        t += 1
    acc = -radial.T + (params.viscosity * inv_rho)[:, None] * visc.T
    if use_x:
        xsph = out[t * dim : (t + 1) * dim].T
    else:
        xsph = jnp.zeros_like(acc)
    return acc, xsph
