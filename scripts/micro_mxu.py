"""Hardware microbench: MXU moment-form forces vs the elementwise fold.

The one untried lever (VERDICT r02 #1): the per-axis pair contractions
    acc_k  = -sum_j radial_ij d_k + mu/rho_i sum_j g_ij dv_k ;  xsph_k
are matmul-shaped in moment form:
    sum_j radial_ij x_jk  and  sum_j radial_ij          (and same for g, xw)
i.e. one batched [3*cap, 3cap] @ [3cap, 7] dot per slab-block with the
window axis (96 lanes) as the contraction dim — MXU work replacing the
~21 VPU ops/pair of the per-axis loop.

Key numerical fix vs the reverted ROADMAP item 8 (which measured this as
VPU elementwise): inv_r is made EXACTLY zero at r2 <= tiny, so the
inv_r-amplified self term vanishes from the radial plane before the
contraction instead of swamping the f32 mantissa of both moments.

Variants:
  v0   baseline _forces fold (elementwise, per-axis)
  v1   moment form, ONE stacked dot (3 planes x 7 feats), HIGHEST precision
  v1d  same, DEFAULT precision (bf16 multiplies, f32 accumulate) - err check
  v2   moment form, two dots (radial x [x,1]; {g,xw} x [v,1]), HIGHEST
  v3   v1 + Gram-trick r2 (|xi|^2+|xj|^2-2xi.xj, K=3 dot) - cancellation check

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/micro_mxu.py [N]
"""


from __future__ import annotations

import os as _os, sys as _sys  # bare-runnable: repo root on sys.path
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import functools
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from sph_pie_tpu.kernels import eos, smoothing
from sph_pie_tpu.neighbors import binned as nb
from sph_pie_tpu.scenes import dam_break_3d
from sph_pie_tpu.solvers import wcsph_binned
from sph_pie_tpu.solvers.wcsph_binned import _planar, _r2
from sph_pie_tpu.utils.struct import replace


def sync(x):
    return float(np.asarray(jax.device_get(x)))


def timeit(fn, *args, reps=5):
    out = fn(*args)
    jax.tree.map(lambda a: a.block_until_ready(), out)
    sync(jax.tree.leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    sync(jax.tree.leaves(out)[0].ravel()[0])
    return (time.perf_counter() - t0) / reps * 1e3, out


def relerr(a, b, valid):
    v = np.asarray(valid)
    a = np.asarray(a)[v]
    b = np.asarray(b)[v]
    scale = max(1.0e-30, float(np.abs(a).max()))
    return float(np.abs(a - b).max() / scale)


def forces_moment(
    params,
    grid,
    b,
    precision=lax.Precision.HIGHEST,
    two_dots: bool = False,
    gram: bool = False,
):
    """Moment-form pressure+viscosity+cohesion+XSPH over slab windows."""
    dim, h = params.dim, params.h
    tiny = jnp.asarray(1e-12, b.pos.dtype)

    inv_rho = 1.0 / b.density
    pr2 = b.pressure * inv_rho * inv_rho
    m_rho = b.mass * inv_rho

    names = [f"p{k}" for k in range(dim)] + [f"v{k}" for k in range(dim)]

    def pair(carry, hm, w):
        if gram:
            hx = jnp.stack([hm[f"p{k}"] for k in range(dim)], axis=-1)
            wx = jnp.stack([w[f"p{k}"] for k in range(dim)], axis=-1)
            cross = jnp.einsum(
                "bcd,bwd->bcw", hx, wx, precision=precision
            )
            r2 = (
                hm["xx"][:, :, None]
                + w["xx"][:, None, :]
                - 2.0 * cross
            )
            r2 = jnp.maximum(r2, 0.0)
        else:
            _, r2 = _r2(dim, hm, w)
        # EXACT zero at the self pair: the radial plane carries inv_r, so
        # moment cancellation of the self term must be exact, not f32.
        inv_r = jnp.where(r2 > tiny, lax.rsqrt(r2), 0.0)
        r = r2 * inv_r

        m_j = w["mass"][:, None, :]
        gw = smoothing.spiky_grad_mag(dim, h, r)
        p_term = hm["pr2"][:, :, None] + w["pr2"][:, None, :]
        radial = m_j * p_term * gw
        if params.use_cohesion:
            coh = smoothing.cohesion(dim, h, r)
            radial = radial + params.surface_tension * (m_j * coh)
        radial = radial * inv_r

        lap = smoothing.visc_lap(dim, h, r)
        visc_w = w["m_rho"][:, None, :] * lap
        wk = smoothing.poly6(dim, h, r2)
        xw = w["m_rho"][:, None, :] * wk

        ones = jnp.ones_like(w["p0"])
        if two_dots:
            fx = jnp.stack(
                [w[f"p{k}"] for k in range(dim)] + [ones], axis=-1
            )  # [blk, 3cap, 4]
            fv = jnp.stack(
                [w[f"v{k}"] for k in range(dim)] + [ones], axis=-1
            )
            mr = jnp.einsum("bcw,bwf->bcf", radial, fx, precision=precision)
            mvx = jnp.einsum(
                "bpcw,bwf->bpcf",
                jnp.stack([visc_w, xw], axis=1),
                fv,
                precision=precision,
            )
            rad_x = [mr[..., k] for k in range(dim)]
            rad_1 = mr[..., dim]
            vis_v = [mvx[:, 0, :, k] for k in range(dim)]
            vis_1 = mvx[:, 0, :, dim]
            xw_v = [mvx[:, 1, :, k] for k in range(dim)]
            xw_1 = mvx[:, 1, :, dim]
        else:
            feats = jnp.stack(
                [w[nm] for nm in names] + [ones], axis=-1
            )  # [blk, 3cap, 7]
            planes = jnp.stack([radial, visc_w, xw], axis=1)
            mom = jnp.einsum(
                "bpcw,bwf->bpcf", planes, feats, precision=precision
            )  # [blk, 3, cap, 7]
            rad_x = [mom[:, 0, :, k] for k in range(dim)]
            vis_v = [mom[:, 1, :, dim + k] for k in range(dim)]
            xw_v = [mom[:, 2, :, dim + k] for k in range(dim)]
            rad_1 = mom[:, 0, :, 2 * dim]
            vis_1 = mom[:, 1, :, 2 * dim]
            xw_1 = mom[:, 2, :, 2 * dim]

        out = list(carry)
        for k in range(dim):
            out[k] = out[k] + rad_x[k]
            out[dim + k] = out[dim + k] + vis_v[k]
            out[2 * dim + k] = out[2 * dim + k] + xw_v[k]
        out[3 * dim] = out[3 * dim] + rad_1
        out[3 * dim + 1] = out[3 * dim + 1] + vis_1
        out[3 * dim + 2] = out[3 * dim + 2] + xw_1
        return tuple(out)

    fields = {
        **_planar("p", b.pos),
        **_planar("v", b.vel),
        "mass": b.mass,
        "pr2": pr2,
        "m_rho": m_rho,
    }
    if gram:
        fields["xx"] = jnp.sum(b.pos * b.pos, axis=-1)
    zero = jnp.zeros_like(b.mass)
    init = tuple(zero for _ in range(3 * dim + 3))
    out = nb.slab_fold(grid, fields, pair, init)

    # O(S) epilogue: fold the home-side factors back in.
    rad_x = jnp.stack(out[:dim], axis=-1)
    vis_v = jnp.stack(out[dim : 2 * dim], axis=-1)
    xw_v = jnp.stack(out[2 * dim : 3 * dim], axis=-1)
    rad_1 = out[3 * dim][:, None]
    vis_1 = out[3 * dim + 1][:, None]
    xw_1 = out[3 * dim + 2][:, None]
    mu_rho_i = (params.viscosity * inv_rho)[:, None]
    acc = (rad_x - rad_1 * b.pos) + mu_rho_i * (vis_v - vis_1 * b.vel)
    xsph = xw_v - xw_1 * b.vel
    return acc, xsph


def forces_moment_centered(
    params, grid, b, precision=lax.Precision.HIGHEST
):
    """Moment form with per-block centering + per-slab home correction.

    The plain moment form's epilogue subtracts two moments of magnitude
    ~sum|w|*|x| to produce a result of magnitude ~sum|w|*h — an f32
    cancellation amplifying rounding by |x|/h (~50x at 1M, measured
    4e-5 rel err). Centering the dot features on the block's mean home
    position and applying the home-side correction INSIDE each slab
    (sum_j w (x_j - c) - (sum_j w)(x_i - c) == sum_j w (x_j - x_i)
    exactly) keeps every accumulated term at window-extent magnitude
    (~3h), restoring ~1e-7 parity with the fold.
    """
    dim, h = params.dim, params.h
    tiny = jnp.asarray(1e-12, b.pos.dtype)

    inv_rho = 1.0 / b.density
    pr2 = b.pressure * inv_rho * inv_rho
    m_rho = b.mass * inv_rho

    def pair(carry, hm, w):
        _, r2 = _r2(dim, hm, w)
        inv_r = jnp.where(r2 > tiny, lax.rsqrt(r2), 0.0)
        r = r2 * inv_r

        m_j = w["mass"][:, None, :]
        gw = smoothing.spiky_grad_mag(dim, h, r)
        p_term = hm["pr2"][:, :, None] + w["pr2"][:, None, :]
        radial = m_j * p_term * gw
        if params.use_cohesion:
            coh = smoothing.cohesion(dim, h, r)
            radial = radial + params.surface_tension * (m_j * coh)
        radial = radial * inv_r

        lap = smoothing.visc_lap(dim, h, r)
        visc_w = w["m_rho"][:, None, :] * lap
        wk = smoothing.poly6(dim, h, r2)
        xw = w["m_rho"][:, None, :] * wk

        # Per-block-cell centers from the valid home slots. O(blk*cap),
        # amortised over the [blk, cap, 3cap] pair work.
        msk = (hm["mass"] > 0).astype(b.pos.dtype)
        cnt = jnp.maximum(jnp.sum(msk, axis=1), 1.0)  # [blk]
        cx = [jnp.sum(hm[f"p{k}"] * msk, axis=1) / cnt for k in range(dim)]
        cv = [jnp.sum(hm[f"v{k}"] * msk, axis=1) / cnt for k in range(dim)]

        ones = jnp.ones_like(w["p0"])
        feats = jnp.stack(
            [w[f"p{k}"] - cx[k][:, None] for k in range(dim)]
            + [w[f"v{k}"] - cv[k][:, None] for k in range(dim)]
            + [ones],
            axis=-1,
        )  # [blk, 3cap, 7]
        planes = jnp.stack([radial, visc_w, xw], axis=1)
        mom = jnp.einsum(
            "bpcw,bwf->bpcf", planes, feats, precision=precision
        )
        rad_1 = mom[:, 0, :, 2 * dim]
        vis_1 = mom[:, 1, :, 2 * dim]
        xw_1 = mom[:, 2, :, 2 * dim]

        out = list(carry)
        for k in range(dim):
            hxc = hm[f"p{k}"] - cx[k][:, None]
            hvc = hm[f"v{k}"] - cv[k][:, None]
            out[k] = out[k] + (mom[:, 0, :, k] - rad_1 * hxc)
            out[dim + k] = out[dim + k] + (
                mom[:, 1, :, dim + k] - vis_1 * hvc
            )
            out[2 * dim + k] = out[2 * dim + k] + (
                mom[:, 2, :, dim + k] - xw_1 * hvc
            )
        return tuple(out)

    fields = {
        **_planar("p", b.pos),
        **_planar("v", b.vel),
        "mass": b.mass,
        "pr2": pr2,
        "m_rho": m_rho,
    }
    zero = jnp.zeros_like(b.mass)
    init = tuple(zero for _ in range(3 * dim))
    out = nb.slab_fold(grid, fields, pair, init)

    rad = jnp.stack(out[:dim], axis=-1)
    vis = jnp.stack(out[dim : 2 * dim], axis=-1)
    xsph = jnp.stack(out[2 * dim : 3 * dim], axis=-1)
    acc = rad + (params.viscosity * inv_rho)[:, None] * vis
    return acc, xsph


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    scene = dam_break_3d(n_target=n)
    grid = scene.bgrid
    params = scene.params
    print(
        json.dumps(
            {
                "n": n,
                "cap": grid.cap,
                "block_cells": grid.block_cells,
                "num_cells": grid.num_cells,
                "backend": jax.default_backend(),
            }
        ),
        flush=True,
    )

    # settle a few steps so density/pressure are physical, then freeze
    b = scene.binned_state()
    b = wcsph_binned.simulate(params, grid, b, 5)
    rho = wcsph_binned._density(params, grid, b)
    prs = eos.tait_pressure(params, rho)
    b = replace(b, density=rho, pressure=prs)
    sync(b.pos[0, 0])

    valid = b.valid

    v0 = jax.jit(lambda bb: wcsph_binned._forces(params, grid, bb))
    t0, (acc0, xs0) = timeit(v0, b)
    print(json.dumps({"v0_fold_ms": round(t0, 2)}), flush=True)

    results = {"v0_fold_ms": round(t0, 2)}
    variants = [
        ("v1_mom_hi", dict(precision=lax.Precision.HIGHEST)),
        ("v1d_mom_default", dict(precision=lax.Precision.DEFAULT)),
        (
            "v2_mom_2dot_hi",
            dict(precision=lax.Precision.HIGHEST, two_dots=True),
        ),
        (
            "v3_mom_gram_hi",
            dict(precision=lax.Precision.HIGHEST, gram=True),
        ),
        ("v4_mom_centered_hi", dict(centered=True)),
        (
            "v4d_mom_centered_default",
            dict(centered=True, precision=lax.Precision.DEFAULT),
        ),
    ]
    for name, kw in variants:
        if kw.pop("centered", False):
            fn = jax.jit(
                lambda bb, kw=kw: forces_moment_centered(
                    params, grid, bb, **kw
                )
            )
        else:
            fn = jax.jit(
                lambda bb, kw=kw: forces_moment(params, grid, bb, **kw)
            )
        try:
            t, (acc, xs) = timeit(fn, b)
            row = {
                f"{name}_ms": round(t, 2),
                f"{name}_speedup": round(t0 / t, 3),
                f"{name}_err_acc": relerr(acc, acc0, valid),
                f"{name}_err_xsph": relerr(xs, xs0, valid),
            }
        except Exception as e:  # keep the sweep alive per variant
            row = {f"{name}_error": f"{type(e).__name__}: {e}"[:200]}
        results.update(row)
        print(json.dumps(row), flush=True)

    print(json.dumps({"summary": results}), flush=True)


if __name__ == "__main__":
    main()
