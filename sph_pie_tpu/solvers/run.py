"""Scene run loop: epochs of fused steps with emission at epoch boundaries.

The whole loop — emit, bin, roll ``epoch_steps`` fused steps, unbin — runs
as one jit-compiled ``lax.scan`` over epochs, so even emitter scenes execute
entirely on-device. Emission semantics: a particle whose spawn step falls
inside an epoch activates at that epoch's start (documented contract; the
oracle tests mirror it).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from sph_pie_tpu.core.state import ParticleState
from sph_pie_tpu.neighbors import binned as nb
from sph_pie_tpu.scenes import emitter as em_lib
from sph_pie_tpu.solvers import wcsph_binned


@partial(jax.jit, static_argnames=("grid", "epoch_steps"))
def run_epochs(
    params,
    grid: nb.BinnedGrid,
    state: ParticleState,
    emitter: em_lib.EmitterSchedule | None,
    obstacles,
    epoch_steps: int,
    n_epochs,
    start_step=0,
    boundary=None,
    pbf_params=None,
) -> ParticleState:
    """Run n_epochs * epoch_steps steps with emission between epochs.

    ``n_epochs`` and ``start_step`` are DYNAMIC scalars: every horizon
    shares one compilation (a static epoch count meant each new horizon
    recompiled the whole scan — measured as a 7x apparent slowdown of the
    round-1 emitter bench, which was really compile time).

    ``pbf_params`` selects the PBF constraint solver for the epochs
    (BASELINE config #4) instead of WCSPH. The unbin/bin round-trip at
    epoch boundaries carries density (``nb.bin_state``), so PBF's
    previous-step Monaghan weight survives; ``sim_time`` is re-seeded
    from the running step count so moving obstacles keep their phase."""
    capacity = state.capacity
    start_step = jnp.asarray(start_step, jnp.int32)

    def epoch(e, carry):
        st, overflow = carry
        step0 = start_step + e * epoch_steps
        if emitter is not None:
            st = em_lib.emit_due(st, emitter, step0)
        b = nb.bin_state(
            grid, st, boundary, sim_time=step0.astype(params.dt.dtype) * params.dt
        )
        if pbf_params is not None:
            from sph_pie_tpu.solvers import pbf as pbf_lib

            b = pbf_lib.simulate(
                params, grid, pbf_params, b, epoch_steps, obstacles
            )
        else:
            b = wcsph_binned.simulate(params, grid, b, epoch_steps, obstacles)
        return nb.unbin(grid, b, capacity), jnp.maximum(overflow, b.overflow)

    state, overflow = lax.fori_loop(
        0,
        jnp.asarray(n_epochs, jnp.int32),
        epoch,
        (state, jnp.zeros((), jnp.int32)),
    )
    return state, overflow


def run_scene(scene, n_steps: int, epoch_steps: int = 50, pbf_params=None):
    """Convenience host API over a Scene (handles emitters + obstacles)."""
    n_epochs = -(-n_steps // epoch_steps)
    return run_epochs(
        scene.params,
        scene.bgrid,
        scene.state,
        scene.emitter,
        scene.obstacles,
        epoch_steps,
        n_epochs,
        boundary=getattr(scene, "boundary", None),
        pbf_params=pbf_params,
    )
