"""Static obstacles: penalty forces from simple SDF shapes.

Fixed-count arrays (possibly zero-length) so the jit signature is static;
an empty Obstacles is a no-op that costs nothing after XLA folds the
zero-size reductions away.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sph_pie_tpu.utils.struct import pytree_dataclass


@pytree_dataclass
class Obstacles:
    """Spheres (circles in 2D) and axis-aligned boxes."""

    sphere_center: jax.Array  # [Ms, dim]
    sphere_radius: jax.Array  # [Ms]
    box_lo: jax.Array         # [Mb, dim]
    box_hi: jax.Array         # [Mb, dim]
    stiffness: jax.Array      # [] penalty spring constant
    damping: jax.Array        # [] velocity damping inside penetration
    ramp_dist: jax.Array      # [] damping ramps in over this depth (a
                              # discontinuous damper breaks trajectory
                              # parity — see solvers/wcsph.boundary_accel)


def empty(dim: int, dtype=jnp.float32) -> Obstacles:
    z = lambda *s: jnp.zeros(s, dtype)
    return Obstacles(
        sphere_center=z(0, dim),
        sphere_radius=z(0),
        box_lo=z(0, dim),
        box_hi=z(0, dim),
        stiffness=jnp.asarray(1e4, dtype),
        damping=jnp.asarray(10.0, dtype),
        ramp_dist=jnp.asarray(2e-3, dtype),
    )


def make(
    dim: int,
    spheres=(),          # iterable of (center, radius)
    boxes=(),            # iterable of (lo, hi)
    stiffness: float = 1e4,
    damping: float = 10.0,
    ramp_dist: float = 2e-3,
    dtype=jnp.float32,
) -> Obstacles:
    sc = [c for c, _ in spheres]
    sr = [r for _, r in spheres]
    bl = [lo for lo, _ in boxes]
    bh = [hi for _, hi in boxes]
    f = lambda v, *s: (
        jnp.asarray(v, dtype).reshape(len(v), *s[1:])
        if len(v)
        else jnp.zeros(s, dtype)
    )
    return Obstacles(
        sphere_center=f(sc, 0, dim),
        sphere_radius=f(sr, 0),
        box_lo=f(bl, 0, dim),
        box_hi=f(bh, 0, dim),
        stiffness=jnp.asarray(stiffness, dtype),
        damping=jnp.asarray(damping, dtype),
        ramp_dist=jnp.asarray(ramp_dist, dtype),
    )


def accel(obs: Obstacles, pos: jax.Array, vel: jax.Array) -> jax.Array:
    """Penalty acceleration pushing particles out of all obstacles.

    pos, vel: [N, dim]. Returns [N, dim].
    """
    acc = jnp.zeros_like(pos)
    max_pen = jnp.zeros(pos.shape[:1], pos.dtype)

    if obs.sphere_center.shape[0]:
        d = pos[:, None, :] - obs.sphere_center[None, :, :]     # [N, Ms, dim]
        dist = jnp.sqrt(jnp.maximum(jnp.sum(d * d, -1), 1e-12))  # [N, Ms]
        pen = jnp.maximum(obs.sphere_radius[None, :] - dist, 0.0)
        nrm = d / dist[..., None]
        acc = acc + obs.stiffness * jnp.sum(pen[..., None] * nrm, axis=1)
        max_pen = jnp.maximum(max_pen, jnp.max(pen, axis=1))

    if obs.box_lo.shape[0]:
        # Signed distance to an AABB; inside, push out along the closest face.
        lo = obs.box_lo[None, :, :]
        hi = obs.box_hi[None, :, :]
        p = pos[:, None, :]
        inside = jnp.all((p > lo) & (p < hi), axis=-1)           # [N, Mb]
        d_lo = p - lo    # distance to each low face (positive inside)
        d_hi = hi - p
        d_face = jnp.minimum(d_lo, d_hi)                          # [N, Mb, dim]
        min_ax = jnp.argmin(d_face, axis=-1)                      # [N, Mb]
        pen = jnp.min(d_face, axis=-1)                            # [N, Mb]
        sign = jnp.where(
            jnp.take_along_axis(d_lo, min_ax[..., None], -1)
            <= jnp.take_along_axis(d_hi, min_ax[..., None], -1),
            -1.0,
            1.0,
        )[..., 0]                                                 # [N, Mb]
        push = sign[..., None] * jax.nn.one_hot(
            min_ax, pos.shape[-1], dtype=pos.dtype
        )                                                         # [N, Mb, dim]
        w = jnp.where(inside, pen, 0.0)
        acc = acc + obs.stiffness * jnp.sum(w[..., None] * push, axis=1)
        max_pen = jnp.maximum(max_pen, jnp.max(w, axis=1))

    ramp = jnp.minimum(max_pen / obs.ramp_dist, 1.0)
    acc = acc - obs.damping * ramp[:, None] * vel
    return acc
