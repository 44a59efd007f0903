"""Equations of state for weakly-compressible SPH."""

from __future__ import annotations

import jax.numpy as jnp

from sph_pie_tpu.core.params import FluidParams


def tait_pressure(params: FluidParams, density):
    """Tait EOS: p = B ((rho/rho0)^gamma - 1), clamped at 0.

    The clamp ("free-surface" / no-tension condition) suppresses the
    clumping instability at the fluid surface; the CPU oracle applies the
    identical clamp. ``eos_gamma`` is a static int so the power lowers to
    multiplies.
    """
    ratio = density / params.rest_density
    p = params.eos_stiffness * (ratio**params.eos_gamma - 1.0)
    return jnp.maximum(p, 0.0)
