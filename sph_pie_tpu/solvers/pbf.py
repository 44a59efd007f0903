"""Position-Based Fluids (Macklin & Mueller 2013) on the binned layout.

BASELINE config #4: incompressible PBF solver. The constraint loop runs a
fixed number of Jacobi iterations (static — jit/fori friendly):

  predict x* from external forces
  repeat iters times:
      rho_i, sum-of-gradients  ->  lambda_i = -C_i / (sum|grad|^2 + eps)
      dx_i = (1/rho0) sum_j (lambda_i + lambda_j + s_corr) gradW_ij
  v = (x* - x)/dt ; optional XSPH smoothing ; x = x*

Uses the same gather-free slab-window machinery as WCSPH
(``neighbors/binned.py``). An artificial-pressure term (s_corr, the
"tensile instability" fix from the paper) provides surface cohesion.

The CPU mirror for testing lives in ``tests/test_pbf.py``'s PbfOracle.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from sph_pie_tpu.core.params import FluidParams
from sph_pie_tpu.kernels import smoothing
from sph_pie_tpu.neighbors import binned as nb
from sph_pie_tpu.solvers.wcsph import boundary_accel, clamp_speed
from sph_pie_tpu.solvers.wcsph_binned import _planar, _r2
from sph_pie_tpu.utils.struct import pytree_dataclass, replace


@pytree_dataclass(meta_fields=("iters",))
class PbfParams:
    """PBF solver knobs; FluidParams supplies h/dt/rho0/bounds/gravity."""

    iters: int                  # constraint iterations (static)
    relax_eps: jax.Array        # CFM epsilon in lambda denominator
    s_corr_k: jax.Array         # artificial pressure strength
    s_corr_n: jax.Array         # artificial pressure exponent (4.0 typical)
    s_corr_dq: jax.Array        # reference distance as a fraction of h


def make_pbf_params(
    iters: int = 4,
    relax_eps: float = 100.0,
    s_corr_k: float = 0.1,
    s_corr_n: float = 4.0,
    s_corr_dq: float = 0.3,
    dtype=jnp.float32,
) -> PbfParams:
    """``s_corr_k`` is h-relative: the effective artificial-pressure
    coefficient is s_corr_k * h^2 (lambda carries length^2 units, so the
    anti-clustering term must scale with h^2 to stay resolution-neutral)."""
    f = lambda v: jnp.asarray(v, dtype)
    return PbfParams(
        iters=int(iters),
        relax_eps=f(relax_eps),
        s_corr_k=f(s_corr_k),
        s_corr_n=f(s_corr_n),
        s_corr_dq=f(s_corr_dq),
    )


def _lambda_fold(params: FluidParams, pbf: PbfParams, grid, fields):
    """Per-particle lambda from one slab fold over predicted positions."""
    dim, h = params.dim, params.h
    h2 = h * h
    tiny = jnp.asarray(1e-12, params.h.dtype)
    rho0 = params.rest_density

    def pair(carry, hm, w):
        rho, grad_sq, grad_sum = carry
        d, r2 = _r2(dim, hm, w)
        live = (r2 < h2) & (r2 > tiny)
        r = jnp.sqrt(jnp.maximum(r2, tiny))
        m_j = jnp.where(live & (w["mass"][:, None, :] > 0), w["mass"][:, None, :], 0.0)
        wk = smoothing.poly6(dim, h, r2)
        rho = rho + jnp.sum(w["mass"][:, None, :] * wk, axis=2)  # incl. self
        # grad_i W_ij (per component, scaled by m_j / rho0)
        gw = smoothing.spiky_grad_mag(dim, h, r) / r
        coef = m_j * gw / rho0
        gs = []
        for k in range(dim):
            g_k = coef * d[k]                         # [blk, cap, 3cap]
            grad_sq = grad_sq + jnp.sum(g_k * g_k, axis=2)
            gs.append(jnp.sum(g_k, axis=2))
        grad_sum = tuple(a + g for a, g in zip(grad_sum, gs))
        return (rho, grad_sq, grad_sum)

    S = grid.num_slots
    dt = fields["mass"].dtype
    zero = jnp.zeros((S,), dt)
    init = (zero, zero, tuple(zero for _ in range(dim)))
    rho, grad_sq, grad_sum = nb.slab_fold(grid, fields, pair, init)
    # |sum grad|^2 + sum |grad|^2  (the standard CFM denominator)
    denom = grad_sq
    for k in range(dim):
        denom = denom + grad_sum[k] * grad_sum[k]
    # Unclamped constraint (Macklin & Mueller eq. 1): stretched regions
    # attract. Clamping C at 0 breaks the balance against the artificial
    # pressure and the fluid slowly inflates (observed).
    c = rho / rho0 - 1.0
    lam = -c / (denom + pbf.relax_eps)
    return lam, rho


def _dx_fold(params: FluidParams, pbf: PbfParams, grid, fields):
    """Position corrections from lambdas."""
    dim, h = params.dim, params.h
    h2 = h * h
    tiny = jnp.asarray(1e-12, params.h.dtype)
    rho0 = params.rest_density
    w_dq = smoothing.poly6(dim, h, (pbf.s_corr_dq * h) ** 2)

    def pair(carry, hm, w):
        d, r2 = _r2(dim, hm, w)
        live = (r2 < h2) & (r2 > tiny)
        r = jnp.sqrt(jnp.maximum(r2, tiny))
        # dx_i = sum_j (m_j/rho0) (lam_i + lam_j + s_corr) grad_i W_ij —
        # the mass factor is REQUIRED with physical masses (the unit-mass
        # paper form blows corrections up by 1/m; observed 3D explosion).
        m_j = jnp.where(live, w["mass"][:, None, :], 0.0)
        wk = smoothing.poly6(dim, h, r2)
        s_corr = -(pbf.s_corr_k * h * h) * (wk / w_dq) ** pbf.s_corr_n
        lam_sum = hm["lam"][:, :, None] + w["lam"][:, None, :] + s_corr
        gw = smoothing.spiky_grad_mag(dim, h, r) / r
        coef = m_j * lam_sum * gw / rho0
        return tuple(
            c_k + jnp.sum(coef * d[k], axis=2) for c_k, k in zip(carry, range(dim))
        )

    S = grid.num_slots
    zero = jnp.zeros((S,), fields["mass"].dtype)
    dxs = nb.slab_fold(grid, fields, pair, tuple(zero for _ in range(dim)))
    return jnp.stack(dxs, axis=-1)


def _xsph_fold(params: FluidParams, grid, pos, vel, mass, rho):
    """XSPH velocity-smoothing sum over neighbors (planar layout)."""
    dim, h = params.dim, params.h
    h2 = h * h
    tiny = jnp.asarray(1e-12, params.h.dtype)

    def pair(carry, hm, w):
        d, r2 = _r2(dim, hm, w)
        live = (r2 < h2) & (r2 > tiny)
        m_j = jnp.where(live, w["mass"][:, None, :], 0.0)
        wk = smoothing.poly6(dim, h, r2)
        xw = 2.0 * m_j / (hm["rho"][:, :, None] + w["rho"][:, None, :]) * wk
        return tuple(
            c_k + jnp.sum(xw * (w[f"v{k}"][:, None, :] - hm[f"v{k}"][:, :, None]), axis=2)
            for c_k, k in zip(carry, range(dim))
        )

    fields = {
        **_planar("p", pos),
        **_planar("v", vel),
        "mass": mass,
        "rho": rho,
    }
    zero = jnp.zeros((grid.num_slots,), pos.dtype)
    out = nb.slab_fold(grid, fields, pair, tuple(zero for _ in range(dim)))
    return jnp.stack(out, axis=-1)


@partial(jax.jit, static_argnames=("grid",))
def step(
    params: FluidParams,
    grid: nb.BinnedGrid,
    pbf: PbfParams,
    b: nb.BinnedState,
    obstacles=None,
) -> nb.BinnedState:
    """One PBF step in binned space (conditional amortised rebin)."""
    from sph_pie_tpu.solvers.wcsph_binned import maybe_rebin

    # The lazy displacement check compares net drift (pos vs bin_pos);
    # intra-step constraint excursions are still covered because
    # ``travel`` keeps accumulating every intermediate move bound below.
    b = maybe_rebin(grid, b)
    valid = (b.valid & ~nb.frozen_mask(grid, b))[:, None]

    # Predict
    acc = jnp.zeros_like(b.pos) + params.gravity
    acc = acc + boundary_accel(params, b.pos, b.vel)
    if obstacles is not None:
        from sph_pie_tpu.scenes import obstacles as obs_lib

        acc = acc + obs_lib.accel(obstacles, b.pos, b.vel)
    vel = jnp.where(valid, b.vel + params.dt * acc, 0.0)
    vel = clamp_speed(params, vel)
    x_star = jnp.where(valid, b.pos + params.dt * vel, b.pos)

    # Verlet-skin bookkeeping must bound every intermediate move, not just
    # net displacement — constraint iterations shift particles too.
    def max_norm(v):
        return jnp.sqrt(jnp.maximum(jnp.max(jnp.sum(v * v, -1)), 0.0))

    step_disp = max_norm(x_star - b.pos)

    # Constraint iterations (fixed count, static)
    def iter_body(_, carry):
        x, dacc = carry
        fields = {**_planar("p", x), "mass": b.mass}
        lam, _ = _lambda_fold(params, pbf, grid, fields)
        fields_l = {**fields, "lam": lam}
        dx = _dx_fold(params, pbf, grid, fields_l)
        dx = jnp.where(valid, dx, 0.0)
        x = jnp.clip(x + dx, params.bound_min, params.bound_max)
        return (x, dacc + max_norm(dx))

    x_star, step_disp = lax.fori_loop(0, pbf.iters, iter_body, (x_star, step_disp))

    new_vel = jnp.where(valid, (x_star - b.pos) / params.dt, 0.0)
    new_vel = clamp_speed(params, new_vel)

    # Final density (diagnostics/rendering + XSPH weights)
    fields = {**_planar("p", x_star), "mass": b.mass}
    _, rho = _lambda_fold(params, pbf, grid, fields)
    rho = jnp.maximum(rho, 1e-6 * params.rest_density)  # safe 1/rho everywhere

    if params.use_xsph:
        # XSPH velocity smoothing — "important for coherent motion"
        # (Macklin & Mueller 2013 section 4); damps the energy the
        # constraint projection injects.
        new_vel = new_vel + params.xsph_eps * _xsph_fold(
            params, grid, x_star, new_vel, b.mass, rho
        )
        new_vel = jnp.where(valid, clamp_speed(params, new_vel), 0.0)

    return replace(
        b,
        pos=jnp.where(valid, x_star, b.pos),
        vel=new_vel,
        density=rho,
        travel=b.travel + step_disp,
    )


@partial(jax.jit, static_argnames=("grid",))
def simulate(params, grid, pbf, b, n_steps, obstacles=None) -> nb.BinnedState:
    return lax.fori_loop(
        0,
        jnp.asarray(n_steps, jnp.int32),
        lambda _, s: step(params, grid, pbf, s, obstacles),
        b,
    )
