"""Physical / numerical parameters for the SPH solvers.

Analogous in role to the reference's merged runtime config object
(`server/configStore.js:44-71` in sphereisaiahmin-dev/sph-pie): a single
validated record that every layer below receives explicitly (no module-level
singletons — SURVEY.md §7.4 flags those as an anti-pattern to avoid).

``FluidParams`` is a pytree of scalars so that changing a physical constant
does NOT trigger recompilation; only truly structural knobs (``dim``,
``eos_gamma`` as an integer exponent) are static metadata.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sph_pie_tpu.utils.struct import pytree_dataclass


@pytree_dataclass(meta_fields=("dim", "eos_gamma", "use_xsph", "use_cohesion"))
class FluidParams:
    """Parameters of a weakly-compressible SPH fluid.

    Units are arbitrary-but-consistent (the scene configs use SI-ish metres /
    seconds / kg).
    """

    dim: int                    # 2 or 3 (static)
    eos_gamma: int              # Tait exponent (static; 7 classic, 1 = linear)
    use_xsph: bool              # static: False compiles the XSPH term away
    use_cohesion: bool          # static: False compiles cohesion away

    h: jax.Array                # smoothing/support radius
    dt: jax.Array               # timestep
    rest_density: jax.Array     # rho_0
    sound_speed: jax.Array      # c_0 for the Tait EOS stiffness
    viscosity: jax.Array        # Mueller-03 dynamic viscosity mu
    xsph_eps: jax.Array         # XSPH velocity-smoothing strength (0 = off)
    surface_tension: jax.Array  # cohesion coefficient (0 = off)
    gravity: jax.Array          # [dim] body acceleration
    bound_min: jax.Array        # [dim] domain AABB lower corner
    bound_max: jax.Array        # [dim] domain AABB upper corner
    boundary_stiffness: jax.Array  # wall penalty spring constant (accel/m)
    boundary_damping: jax.Array    # wall normal-velocity damping (1/s)
    max_speed: jax.Array           # CFL speed clamp (underpins the Verlet-skin
                                   # rebin guarantee in the binned engine)

    @property
    def eos_stiffness(self) -> jax.Array:
        """Tait B = rho_0 c_0^2 / gamma."""
        return self.rest_density * self.sound_speed**2 / self.eos_gamma


def make_params(
    *,
    dim: int,
    h: float,
    dt: float,
    rest_density: float = 1000.0,
    sound_speed: float = 30.0,
    viscosity: float = 0.1,
    xsph_eps: float = 0.0,
    surface_tension: float = 0.0,
    gravity=None,
    bound_min=None,
    bound_max=None,
    # Penalty spring sized so a c0/10-fast particle stops within ~h/2 of
    # the wall (softer springs let impacts dive cells-deep into the wall
    # and pile up past the cell capacity — observed on the 2D dam break).
    boundary_stiffness: float = 1.0e5,
    boundary_damping: float = 20.0,
    max_speed: float | None = None,
    eos_gamma: int = 7,
    dtype=jnp.float32,
) -> FluidParams:
    f = lambda v: jnp.asarray(v, dtype)
    if max_speed is None:
        max_speed = sound_speed  # WCSPH assumes Mach << 1; c0 is a safe cap
    if gravity is None:
        gravity = [0.0] * (dim - 1) + [-9.81]
    if bound_min is None:
        bound_min = [0.0] * dim
    if bound_max is None:
        bound_max = [1.0] * dim
    return FluidParams(
        dim=dim,
        eos_gamma=int(eos_gamma),
        # Terms that are identically zero get compiled out of the hot pair
        # loop (static flags -> dead-code elimination at trace time).
        use_xsph=bool(xsph_eps),
        use_cohesion=bool(surface_tension),
        h=f(h),
        dt=f(dt),
        rest_density=f(rest_density),
        sound_speed=f(sound_speed),
        viscosity=f(viscosity),
        xsph_eps=f(xsph_eps),
        surface_tension=f(surface_tension),
        gravity=f(gravity),
        bound_min=f(bound_min),
        bound_max=f(bound_max),
        boundary_stiffness=f(boundary_stiffness),
        boundary_damping=f(boundary_damping),
        max_speed=f(max_speed),
    )
