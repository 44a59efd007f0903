"""Adaptive timestep: a CFL controller around the binned WCSPH step.

Standard WCSPH stability limits (Monaghan; see also the reference SPH
literature in PAPERS.md):

    dt_acoustic = C_cfl * h / (c0 + v_max)
    dt_force    = C_f   * sqrt(h / a_max)
    dt_viscous  = C_v   * h^2 / nu          (nu = mu / rho0)

The controller takes the minimum each step, clamped to
[dt_min, dt_base] — never above the scene's configured dt (which already
satisfies the acoustic limit at v=0), shrinking through impacts and
recovering afterwards. ``params.dt`` is a traced scalar inside the
FluidParams pytree, so varying it never recompiles, and the Verlet-skin
``travel`` bookkeeping (which multiplies by dt) stays exact.

Opt-in: fixed-dt ``wcsph_binned.simulate`` remains the default (and what
the trajectory contract pins); emission schedules are step-indexed and
assume fixed dt, so adaptive runs are for non-emitter scenes.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from sph_pie_tpu.core.params import FluidParams
from sph_pie_tpu.neighbors import binned as nb
from sph_pie_tpu.solvers import wcsph_binned
from sph_pie_tpu.utils.struct import pytree_dataclass, replace


@pytree_dataclass
class _Carry:
    """Binned state + the (one step stale) max-acceleration estimate."""

    b: nb.BinnedState
    last_amax: jax.Array


def cfl_dt(
    params: FluidParams,
    v_max,
    a_max,
    c_cfl: float = 0.25,
    c_force: float = 0.25,
    c_visc: float = 0.125,
):
    """The three-limit CFL timestep (before clamping)."""
    h = params.h
    tiny = jnp.asarray(1e-12, h.dtype)
    dt_ac = c_cfl * h / (params.sound_speed + v_max)
    dt_f = c_force * jnp.sqrt(h / jnp.maximum(a_max, tiny))
    nu = params.viscosity / params.rest_density
    dt_v = jnp.where(
        params.viscosity > 0, c_visc * h * h / jnp.maximum(nu, tiny), jnp.inf
    )
    return jnp.minimum(jnp.minimum(dt_ac, dt_f), dt_v)


@partial(jax.jit, static_argnames=("grid",))
def simulate_adaptive(
    params: FluidParams,
    grid: nb.BinnedGrid,
    b: nb.BinnedState,
    t_end,
    obstacles=None,
    max_steps: int = 100_000,
    dt_min_frac: float = 0.05,
):
    """Advance to physical time ``t_end`` with per-step CFL dt.

    Returns (state, t_reached, n_steps, dt_last). dt is bounded to
    [dt_min_frac * dt_base, dt_base]; the loop also stops at ``max_steps``
    (a hard bound so a pathological a_max cannot hang the device).
    """
    dt_base = params.dt
    dt_min = dt_min_frac * dt_base
    t_end = jnp.asarray(t_end, b.pos.dtype)

    def cond(carry):
        state, t, k, dt = carry
        return (t < t_end) & (k < max_steps)

    def body(carry):
        state, t, k, _ = carry
        # a_max estimate from the last step's velocity change is one step
        # stale; the dt clamp plus safety factors absorb that.
        v_max = jnp.sqrt(jnp.max(jnp.sum(state.b.vel * state.b.vel, axis=-1)))
        dt = cfl_dt(params, v_max, state.last_amax)
        dt = jnp.clip(dt, dt_min, dt_base)
        dt = jnp.minimum(dt, jnp.maximum(t_end - t, dt_min))
        p = replace(params, dt=dt)
        prev_vel = state.b.vel
        nxt = wcsph_binned.step(p, grid, state.b, obstacles)
        a_max = jnp.sqrt(
            jnp.max(jnp.sum((nxt.vel - prev_vel) ** 2, axis=-1))
        ) / jnp.maximum(dt, 1e-12)
        return (_Carry(b=nxt, last_amax=a_max), t + dt, k + 1, dt)

    init = (
        _Carry(b=b, last_amax=jnp.asarray(0.0, b.pos.dtype)),
        jnp.zeros((), b.pos.dtype),
        jnp.zeros((), jnp.int32),
        dt_base,
    )
    state, t, k, dt = lax.while_loop(cond, body, init)
    return state.b, t, k, dt
