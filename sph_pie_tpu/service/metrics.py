"""Per-step and per-run simulation metrics.

Structural analogue of the reference's domain-metric engines: the per-show
quick metrics (`public/app.js:5024-5047` computeMetrics) and the archive
stats engine (`public/app.js:3898-3953` computeArchiveShowStats) in
sphereisaiahmin-dev/sph-pie. Here the domain is fluid state rather than
flight entries, so the metric set is physical: counts, energies, density
statistics, extremes — computed on-device in one fused jit and returned as
a small dict of scalars.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sph_pie_tpu.core.state import ParticleState

# The flat export row (analogue of EXPORT_COLUMNS,
# sphereisaiahmin-dev/sph-pie server/webhookDispatcher.js:15-19).
METRIC_COLUMNS = (
    "step",
    "time",
    "n_active",
    "mean_density",
    "max_density",
    "min_density",
    "max_speed",
    "mean_speed",
    "kinetic_energy",
    "potential_energy",
    "momentum_x",
    "momentum_y",
    "momentum_z",
    "com_x",
    "com_y",
    "com_z",
)


@jax.jit
def _state_metrics(state: ParticleState, gravity):
    act = state.active
    actf = act.astype(state.pos.dtype)
    n = jnp.maximum(jnp.sum(actf), 1.0)
    m = jnp.where(act, state.mass, 0.0)
    v2 = jnp.sum(state.vel * state.vel, axis=-1)
    speed = jnp.sqrt(v2) * actf
    rho = jnp.where(act, state.density, jnp.nan)
    g_norm = jnp.sqrt(jnp.sum(gravity * gravity))
    # potential energy against the gravity direction
    g_hat = gravity / jnp.maximum(g_norm, 1e-12)
    height = -jnp.sum(state.pos * g_hat, axis=-1)
    mom = jnp.sum(m[:, None] * state.vel, axis=0)
    com = jnp.sum(m[:, None] * state.pos, axis=0) / jnp.maximum(jnp.sum(m), 1e-12)
    return {
        "n_active": jnp.sum(act.astype(jnp.int32)),
        "mean_density": jnp.nanmean(rho),
        "max_density": jnp.nanmax(rho),
        "min_density": jnp.nanmin(rho),
        "max_speed": jnp.max(speed),
        "mean_speed": jnp.sum(speed) / n,
        "kinetic_energy": 0.5 * jnp.sum(m * v2),
        "potential_energy": g_norm * jnp.sum(m * height),
        "momentum": mom,
        "com": com,
    }


def state_metrics(state: ParticleState, params, step: int = 0) -> dict:
    """Host-side dict of python scalars for one state snapshot."""
    raw = _state_metrics(state, params.gravity)
    dim = state.dim
    out = {
        "step": int(step),
        "time": float(params.dt) * int(step),
        "n_active": int(raw["n_active"]),
        "mean_density": float(raw["mean_density"]),
        "max_density": float(raw["max_density"]),
        "min_density": float(raw["min_density"]),
        "max_speed": float(raw["max_speed"]),
        "mean_speed": float(raw["mean_speed"]),
        "kinetic_energy": float(raw["kinetic_energy"]),
        "potential_energy": float(raw["potential_energy"]),
    }
    mom = [float(x) for x in raw["momentum"]] + [0.0] * (3 - dim)
    com = [float(x) for x in raw["com"]] + [0.0] * (3 - dim)
    out.update(momentum_x=mom[0], momentum_y=mom[1], momentum_z=mom[2])
    out.update(com_x=com[0], com_y=com[1], com_z=com[2])
    return out


def metric_row(metrics: dict) -> list:
    """Flatten a metrics dict to the METRIC_COLUMNS order."""
    return [metrics.get(c, "") for c in METRIC_COLUMNS]


def aggregate_run_stats(step_metrics: list[dict]) -> dict:
    """Aggregate statistics over a run's recorded metric rows (the
    archive-analytics analogue of computeArchiveShowStats)."""
    if not step_metrics:
        return {"samples": 0}
    keys = [k for k in step_metrics[0] if k not in ("step", "time")]
    out = {"samples": len(step_metrics)}
    for k in keys:
        vals = [m[k] for m in step_metrics if isinstance(m.get(k), (int, float))]
        if not vals:
            continue
        out[f"{k}_avg"] = sum(vals) / len(vals)
        out[f"{k}_max"] = max(vals)
        out[f"{k}_min"] = min(vals)
    return out
