"""WCSPH on the binned dense layout — the TPU production hot path.

Same physics, constants, and update order as ``solvers/wcsph.py`` (and the
CPU oracle), re-expressed over the gather-free slot layout of
``neighbors/binned.py``:

  * neighbor candidates come from static-slice slab windows — zero gathers;
  * empty slots have ``mass == 0`` and a floored density, so they
    contribute exactly 0 to every pair sum — no mask tensors in the loop;
  * re-binning (the only sort) runs under ``lax.cond`` only when the
    accumulated per-particle displacement bound exceeds skin/2.

The per-step displacement bound is ``dt * min(max_speed, max|v_adv|)``
(the CFL clamp in ``clamp_speed`` makes it hard), which preserves the
cell-list exactness guarantee: any pair within support radius h is always
inside the 3^d stale-cell window.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from sph_pie_tpu.core.params import FluidParams
from sph_pie_tpu.kernels import eos, smoothing
from sph_pie_tpu.neighbors import binned as nb
from sph_pie_tpu.solvers.wcsph import boundary_accel, clamp_speed
from sph_pie_tpu.utils.struct import replace


def _density(params: FluidParams, grid: nb.BinnedGrid, b: nb.BinnedState):
    """rho over home slots via slab windows (self term included)."""
    dim, h = params.dim, params.h
    h2 = h * h
    home = nb.cell_view(grid, b.pos)  # [C, cap, d]

    def pair(rho, w):
        d = home[:, :, None, :] - w["pos"][:, None, :, :]   # [C, cap, 3cap, d]
        r2 = jnp.sum(d * d, axis=-1)
        wk = smoothing.poly6(dim, h, r2)
        return rho + jnp.sum(w["mass"][:, None, :] * wk, axis=2)

    init = jnp.zeros(home.shape[:2], b.pos.dtype)
    rho = nb.slab_fold(grid, {"pos": b.pos, "mass": b.mass}, pair, init)
    return jnp.maximum(nb.flat_view(grid, rho), 1e-6 * params.rest_density)


def _forces(params: FluidParams, grid: nb.BinnedGrid, b: nb.BinnedState):
    """Pressure + viscosity + cohesion accel and XSPH sum over home slots."""
    dim, h = params.dim, params.h
    h2 = h * h
    tiny = jnp.asarray(1e-12, b.pos.dtype)
    pos_i = nb.cell_view(grid, b.pos)        # [C, cap, d]
    vel_i = nb.cell_view(grid, b.vel)
    rho_i = nb.cell_view(grid, b.density)    # [C, cap]
    prs_i = nb.cell_view(grid, b.pressure)

    def pair(carry, w):
        acc, xsph = carry
        d = pos_i[:, :, None, :] - w["pos"][:, None, :, :]  # x_ij
        r2 = jnp.sum(d * d, axis=-1)
        live = (r2 < h2) & (r2 > tiny)
        r = jnp.sqrt(jnp.maximum(r2, tiny))
        rhat = d / r[..., None]
        m_j = jnp.where(live, w["mass"][:, None, :], 0.0)   # empty slots: 0
        rho_j = w["rho"][:, None, :]
        inv_rho_j = 1.0 / rho_j

        gw = smoothing.spiky_grad_mag(dim, h, r)
        p_term = (
            prs_i[..., None] / (rho_i[..., None] ** 2)
            + w["prs"][:, None, :] * inv_rho_j**2
        )
        acc = acc - jnp.sum((m_j * p_term * gw)[..., None] * rhat, axis=2)

        dv = w["vel"][:, None, :, :] - vel_i[:, :, None, :]
        lap = smoothing.visc_lap(dim, h, r)
        visc_w = m_j * inv_rho_j * lap
        acc = acc + (params.viscosity / rho_i[..., None]) * jnp.sum(
            visc_w[..., None] * dv, axis=2
        )

        coh = smoothing.cohesion(dim, h, r)
        acc = acc - params.surface_tension * jnp.sum(
            (m_j * coh)[..., None] * rhat, axis=2
        )

        wk = smoothing.poly6(dim, h, r2)
        xw = jnp.where(live, 2.0 * m_j / (rho_i[..., None] + rho_j) * wk, 0.0)
        xsph = xsph + jnp.sum(xw[..., None] * dv, axis=2)
        return (acc, xsph)

    zero = jnp.zeros(pos_i.shape, b.pos.dtype)
    fields = {
        "pos": b.pos,
        "vel": b.vel,
        "mass": b.mass,
        "rho": b.density,
        "prs": b.pressure,
    }
    acc, xsph = nb.slab_fold(grid, fields, pair, (zero, zero))
    return nb.flat_view(grid, acc), nb.flat_view(grid, xsph)


@partial(jax.jit, static_argnames=("grid",))
def step(params: FluidParams, grid: nb.BinnedGrid, b: nb.BinnedState) -> nb.BinnedState:
    """One WCSPH step in binned space, with conditional amortised rebin."""
    b = lax.cond(
        b.travel > 0.5 * grid.skin,
        lambda x: nb.rebin(grid, x),
        lambda x: x,
        b,
    )

    rho = _density(params, grid, b)
    prs = eos.tait_pressure(params, rho)
    b = replace(b, density=rho, pressure=prs)

    acc, xsph = _forces(params, grid, b)
    acc = acc + params.gravity
    acc = acc + boundary_accel(params, b.pos, b.vel)

    valid = b.valid[:, None]
    vel = jnp.where(valid, b.vel + params.dt * acc, 0.0)
    vel = clamp_speed(params, vel)
    vel_adv = vel + params.xsph_eps * xsph
    pos = jnp.where(valid, b.pos + params.dt * vel_adv, b.pos)

    # Hard per-step displacement bound for the Verlet-skin guarantee.
    step_disp = params.dt * jnp.sqrt(
        jnp.maximum(jnp.max(jnp.sum(vel_adv * vel_adv, axis=-1)), 0.0)
    )
    return replace(b, pos=pos, vel=vel, travel=b.travel + step_disp)


@partial(jax.jit, static_argnames=("grid", "n_steps"))
def simulate(params, grid, b, n_steps: int) -> nb.BinnedState:
    return lax.fori_loop(0, n_steps, lambda _, s: step(params, grid, s), b)
