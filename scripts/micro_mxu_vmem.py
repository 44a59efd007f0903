"""Hardware micro: VMEM-fused weights+dot forces kernel (MXU inside Mosaic).

ROADMAP item 9's one surviving MXU route (VERDICT r03 #2): the XLA
moment-form variants lost 0.44-0.71x because XLA cannot fuse the
elementwise weight producers into dot operands — each slab's
[blk, cap, 3cap] weight planes round-trip HBM (~9.4 MB/plane/slab-block).
A Pallas kernel computes the SAME weight planes in VMEM (VPU, identical
to the shipped forces_pallas inner loop) and contracts them against a
per-class feature tile with lax.dot_general (MXU) without ever leaving
VMEM. This measures whether Mosaic's MXU issue economics beat the VPU
per-axis multiply-reduce at the fold's own shapes — the one number the
round-3 ledger derived by arithmetic instead of measurement.

Moment form per (slab, class, rank-chunk), F = 2*dim + 2 features
[p_k - c_k ..., v_k - cv_k ..., 1, 0pad]:
    P = [press; visc_w; xw]            [rows, 3*RCH, LANE]
    W = feature tile                   [rows, F, LANE]
    mom = dot_general(P, W, contract LANE x LANE, batch rows)
        -> [rows, 3*RCH, F]
    sum press*d_k  = (hm_k - c_k) * mom_press[.., ones] - mom_press[.., k]
    sum visc_w*dv_k = mom_visc[.., dim+k] - (hm_vk - cv_k) * mom_visc[.., ones]
    (xsph identical to visc). Centering c = mass-weighted window mean per
    (row, slab, class) keeps every accumulated term at window-extent
    magnitude — exact telescoping, f32-safe (the trick that fixed the XLA
    centered variant to 1e-6 parity, micro_mxu.py).

Arms (interleaved, min-of-reps):
  fold      XLA slab fold _forces (baseline)
  vpu       shipped forces_pallas (weights + per-axis VPU multiply-reduce)
  mxu       this kernel, f32 dot
  mxu_bf16  this kernel, operands cast bf16 before the dot (f32 accumulate)

Scene: 1M 3D dam break at skin 0.25 / cap 32 (the geometry forces_pallas
supports), surface_tension=0 (cohesion off -> terms = press/visc/xsph).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/micro_mxu_vmem.py [N]
"""


from __future__ import annotations

import os as _os, sys as _sys  # bare-runnable: repo root on sys.path
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sph_pie_tpu.neighbors import binned as nb
from sph_pie_tpu.neighbors.pallas_pair import (
    LANE,
    RCH,
    _class_views,
    _grid_h,
    _make_pair_call,
    _pack_rows,
    _plan,
    _poly6_c,
    _spiky_c,
    _visc_c,
    block_flags,
    forces_pallas,
)
from sph_pie_tpu.scenes import dam_break_3d
from sph_pie_tpu.solvers import wcsph_binned
from sph_pie_tpu.utils.struct import replace


def _build_forces_mxu(grid: nb.BinnedGrid, bf16: bool, interpret: bool = False):
    plan = _plan(grid)
    cap = grid.cap
    dim = grid.dim
    h = _grid_h(grid)
    h2 = h * h
    c_spiky = _spiky_c(dim, h)
    c_visc = _visc_c(dim, h)
    c_poly6 = _poly6_c(dim, h)
    F_MASS, F_PR2, F_MRHO = 2 * dim, 2 * dim + 1, 2 * dim + 2
    n_fields = 2 * dim + 3  # p_k, v_k, mass, pr2, m_rho
    n_out = 3 * dim  # press, visc, xsph per axis
    NF = 2 * dim + 2  # feature columns: p_k-c, v_k-cv, ones, zero pad
    slabs = plan["slabs"]
    rows_blk = plan["rows_blk"]
    nr = plan["nr"]
    tiny = 1e-12
    dot_dtype = jnp.bfloat16 if bf16 else jnp.float32
    # f32 arm: HIGHEST precision — the TPU default lowers an f32 dot to
    # ONE bf16 MXU pass (measured rel err 3.6e-2 on hardware vs 8e-7 in
    # interpret mode, the same bf16-DEFAULT error micro_mxu.py recorded);
    # HIGHEST runs the 3/6-pass decomposition. bf16 arm: operands are
    # already bf16, a single pass is exact for them.
    dot_prec = None if bf16 else lax.Precision.HIGHEST
    dnums = (((2,), (2,)), ((0,), (0,)))  # contract LANE, batch rows

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
                return home_s[f][:, bcls * cap : (bcls + 1) * cap]

            nrc = cap // RCH
            zeros = jnp.zeros((rows_blk, RCH), jnp.float32)
            acc = [
                [[[zeros] * nrc for _ in range(4)] for _ in range(dim)]
                for _ in range(3)
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

                    def winf(f):
                        # [rows, LANE] window values for this class
                        return views[f][a][roff : roff + rows_blk]

                    # mass-weighted window centers, [rows, 1]
                    wm = winf(F_MASS)
                    wsum = jnp.maximum(jnp.sum(wm, axis=1, keepdims=True), tiny)
                    cpos = [
                        jnp.sum(wm * winf(k), axis=1, keepdims=True) / wsum
                        for k in range(dim)
                    ]
                    cvel = [
                        jnp.sum(wm * winf(dim + k), axis=1, keepdims=True)
                        / wsum
                        for k in range(dim)
                    ]
                    # feature tile [rows, NF, LANE]: centered pos/vel + ones
                    feats = jnp.concatenate(
                        [
                            (winf(k) - cpos[k])[:, None, :]
                            for k in range(dim)
                        ]
                        + [
                            (winf(dim + k) - cvel[k])[:, None, :]
                            for k in range(dim)
                        ]
                        + [jnp.ones((rows_blk, 1, LANE), jnp.float32)],
                        axis=1,
                    ).astype(dot_dtype)

                    win = [winf(f)[:, None, :] for f in range(n_fields)]
                    for rc in range(nrc):

                        def hm(f):
                            return hslice(f, bcls)[
                                :, rc * RCH : (rc + 1) * RCH
                            ][:, :, None]

                        r2 = jnp.zeros((rows_blk, RCH, LANE), jnp.float32)
                        for k in range(dim):
                            dk = hm(k) - win[k]
                            r2 = r2 + dk * dk
                        inv_r = lax.rsqrt(jnp.maximum(r2, tiny))
                        r = r2 * inv_r
                        qs = jnp.maximum(h - r, 0.0)
                        gw = c_spiky * qs * qs
                        m_j = win[F_MASS]
                        p_term = hm(F_PR2) + win[F_PR2]
                        # Self-pair mask: the fold zeroes the self term
                        # implicitly (coef * d_k with d_k == 0); the moment
                        # form telescopes it as the difference of two
                        # inv_r-amplified (~1/sqrt(tiny)) products — f32
                        # cancellation error swamps the result (the exact
                        # 37%-error failure of micro_mxu.py's first cut).
                        # Zero the plane BEFORE the dot where r2 == 0.
                        gwr = jnp.where(r2 > 0.0, gw * inv_r, 0.0)
                        press = (m_j * p_term) * gwr
                        visc_w = win[F_MRHO] * (c_visc * qs)
                        qp = jnp.maximum(h2 - r2, 0.0)
                        xw = win[F_MRHO] * ((c_poly6 * qp) * qp * qp)

                        planes = jnp.concatenate(
                            [press, visc_w, xw], axis=1
                        ).astype(dot_dtype)  # [rows, 3*RCH, LANE]
                        mom = lax.dot_general(
                            planes,
                            feats,
                            dnums,
                            precision=dot_prec,
                            preferred_element_type=jnp.float32,
                        )  # [rows, 3*RCH, NF]
                        mp = mom[:, :RCH]
                        mv = mom[:, RCH : 2 * RCH]
                        mx = mom[:, 2 * RCH :]
                        ones_col = 2 * dim
                        for k in range(dim):
                            hmk = hslice(k, bcls)[:, rc * RCH : (rc + 1) * RCH]
                            hvk = hslice(dim + k, bcls)[
                                :, rc * RCH : (rc + 1) * RCH
                            ]
                            acc[0][k][bcls][rc] = acc[0][k][bcls][rc] + (
                                (hmk - cpos[k]) * mp[:, :, ones_col]
                                - mp[:, :, k]
                            )
                            acc[1][k][bcls][rc] = acc[1][k][bcls][rc] + (
                                mv[:, :, dim + k]
                                - (hvk - cvel[k]) * mv[:, :, ones_col]
                            )
                            acc[2][k][bcls][rc] = acc[2][k][bcls][rc] + (
                                mx[:, :, dim + k]
                                - (hvk - cvel[k]) * mx[:, :, ones_col]
                            )
            for t in range(3):
                for k in range(dim):
                    out_ref[t * dim + k] = jnp.concatenate(
                        [c for bcls in range(4) for c in acc[t][k][bcls]],
                        axis=1,
                    )

    return plan, _make_pair_call(grid, plan, n_fields, n_out, kernel, interpret)


def forces_mxu(params, grid, b, bf16=False, interpret=False):
    plan, fn = _build_forces_mxu(grid, bf16, interpret)
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
    xsph = out[2 * dim :].T
    acc = -press.T + (params.viscosity * inv_rho)[:, None] * visc.T
    return acc, xsph


def sync(x):
    return float(np.asarray(jax.device_get(x)))


def main():
    # Persistent compile cache: the Mosaic builds here run ~5 min EACH at
    # 1M (144 unrolled dot blocks); iterating without a cache burns the
    # whole session on recompiles.
    import os

    d = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache",
    )
    os.makedirs(d, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", d)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    scene = dam_break_3d(
        n, skin_frac=0.25, bcap=32, surface_tension=0.0, xsph_eps=0.05
    )
    params, grid = scene.params, scene.bgrid
    assert not bool(params.use_cohesion)
    print(f"n={n} cap={grid.cap} cells={grid.num_cells}", flush=True)

    b = scene.binned_state()
    b = wcsph_binned.simulate(params, grid, b, 5)
    from sph_pie_tpu.kernels import eos

    rho = wcsph_binned._density(params, grid, b)
    b = replace(b, density=rho, pressure=eos.tait_pressure(params, rho))
    sync(b.travel)

    # vpu (shipped forces_pallas) is dropped from the default arm set —
    # its 0.73-0.89x-of-fold number is already in the ledger (ROADMAP
    # item 4) and each extra Mosaic arm costs ~5 min of compile.
    arms = {
        "fold": jax.jit(lambda bb: wcsph_binned._forces(params, grid, bb)),
        "mxu": jax.jit(lambda bb: forces_mxu(params, grid, bb)),
        "mxu_bf16": jax.jit(
            lambda bb: forces_mxu(params, grid, bb, bf16=True)
        ),
    }
    if "--vpu" in sys.argv:
        arms["vpu"] = jax.jit(lambda bb: forces_pallas(params, grid, bb))

    # parity first (vs fold)
    ref_acc, ref_xs = arms["fold"](b)
    ref_acc = np.asarray(ref_acc)
    valid = np.asarray(b.valid)
    scale = float(np.abs(ref_acc[valid]).max())
    for name in [k for k in arms if k != "fold"]:
        acc, xs = arms[name](b)
        err = float(np.abs(np.asarray(acc)[valid] - ref_acc[valid]).max() / scale)
        print(f"parity {name}: rel err {err:.3e}", flush=True)

    reps = 4
    times = {k: [] for k in arms}
    for rep in range(reps):
        for name, fn in arms.items():
            out = fn(b)
            sync(out[0].ravel()[0])
            t0 = time.perf_counter()
            for _ in range(3):
                out = fn(b)
            sync(out[0].ravel()[0])
            times[name].append((time.perf_counter() - t0) / 3 * 1e3)
        print(
            f"rep {rep}: "
            + " ".join(f"{k}={times[k][-1]:.1f}" for k in arms),
            flush=True,
        )
    print("MIN ms: " + " ".join(f"{k}={min(v):.1f}" for k, v in times.items()))


if __name__ == "__main__":
    main()
