"""Obstacles: penalty forces from simple SDF shapes, optionally moving.

Fixed-count arrays (possibly zero-length) so the jit signature is static;
an empty Obstacles is a no-op that costs nothing after XLA folds the
zero-size reductions away.

Motion model (per shape): center(t) = center0 + lin*t + amp*sin(2 pi f t
+ phase). Boxes translate rigidly (lo and hi share the offset). The
penetration damper acts on velocity RELATIVE to the obstacle surface, so
a moving obstacle drags fluid (stirrer/paddle scenes) instead of merely
blocking it. Everything is closed-form in the state's sim_time — no
host-side stepping of obstacle positions, jit-friendly.
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
    sphere_lin: jax.Array     # [Ms, dim] linear velocity
    sphere_amp: jax.Array     # [Ms, dim] oscillation amplitude
    sphere_freq: jax.Array    # [Ms] oscillation frequency (Hz)
    sphere_phase: jax.Array   # [Ms]
    box_lin: jax.Array        # [Mb, dim]
    box_amp: jax.Array        # [Mb, dim]
    box_freq: jax.Array       # [Mb]
    box_phase: jax.Array      # [Mb]
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
        sphere_lin=z(0, dim),
        sphere_amp=z(0, dim),
        sphere_freq=z(0),
        sphere_phase=z(0),
        box_lin=z(0, dim),
        box_amp=z(0, dim),
        box_freq=z(0),
        box_phase=z(0),
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
    sphere_motions=(),   # iterable of (lin, amp, freq, phase) per sphere
    box_motions=(),      # iterable of (lin, amp, freq, phase) per box
    dtype=jnp.float32,
) -> Obstacles:
    sc = [c for c, _ in spheres]
    sr = [r for _, r in spheres]
    bl = [lo for lo, _ in boxes]
    bh = [hi for _, hi in boxes]

    def motions(ms, n):
        ms = list(ms)
        while len(ms) < n:
            ms.append(([0.0] * dim, [0.0] * dim, 0.0, 0.0))
        lin = [m[0] for m in ms]
        amp = [m[1] for m in ms]
        freq = [m[2] for m in ms]
        phase = [m[3] for m in ms]
        return lin, amp, freq, phase

    s_lin, s_amp, s_freq, s_phase = motions(sphere_motions, len(sc))
    b_lin, b_amp, b_freq, b_phase = motions(box_motions, len(bl))
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
        sphere_lin=f(s_lin, 0, dim),
        sphere_amp=f(s_amp, 0, dim),
        sphere_freq=f(s_freq, 0),
        sphere_phase=f(s_phase, 0),
        box_lin=f(b_lin, 0, dim),
        box_amp=f(b_amp, 0, dim),
        box_freq=f(b_freq, 0),
        box_phase=f(b_phase, 0),
        stiffness=jnp.asarray(stiffness, dtype),
        damping=jnp.asarray(damping, dtype),
        ramp_dist=jnp.asarray(ramp_dist, dtype),
    )


def _offsets(lin, amp, freq, phase, t):
    """Rigid translation and surface velocity at sim time t."""
    two_pi = 6.283185307179586
    ang = two_pi * freq * t + phase
    off = lin * t + amp * jnp.sin(ang)[:, None]
    v = lin + amp * (two_pi * freq * jnp.cos(ang))[:, None]
    return off, v


def accel(obs: Obstacles, pos: jax.Array, vel: jax.Array, t=0.0) -> jax.Array:
    """Penalty acceleration pushing particles out of all obstacles.

    pos, vel: [N, dim]; ``t`` is sim time (traced scalar) for moving
    shapes. Returns [N, dim]. The damper acts on velocity relative to the
    penetrated obstacle, weighted by that obstacle's penetration ramp —
    for static shapes this reduces exactly to the round-1 absolute-vel
    damper (overlapping shapes now sum dampers instead of taking the max;
    indistinguishable in practice and smooth either way).
    """
    t = jnp.asarray(t, pos.dtype)
    acc = jnp.zeros_like(pos)

    if obs.sphere_center.shape[0]:
        off, vob = _offsets(
            obs.sphere_lin, obs.sphere_amp, obs.sphere_freq, obs.sphere_phase, t
        )
        center = obs.sphere_center + off
        d = pos[:, None, :] - center[None, :, :]                 # [N, Ms, dim]
        dist = jnp.sqrt(jnp.maximum(jnp.sum(d * d, -1), 1e-12))  # [N, Ms]
        pen = jnp.maximum(obs.sphere_radius[None, :] - dist, 0.0)
        nrm = d / dist[..., None]
        acc = acc + obs.stiffness * jnp.sum(pen[..., None] * nrm, axis=1)
        ramp = jnp.minimum(pen / obs.ramp_dist, 1.0)             # [N, Ms]
        rel = vel[:, None, :] - vob[None, :, :]
        acc = acc - obs.damping * jnp.sum(ramp[..., None] * rel, axis=1)

    if obs.box_lo.shape[0]:
        off, vob = _offsets(
            obs.box_lin, obs.box_amp, obs.box_freq, obs.box_phase, t
        )
        # Signed distance to an AABB; inside, push out along the closest face.
        lo = (obs.box_lo + off)[None, :, :]
        hi = (obs.box_hi + off)[None, :, :]
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
        ramp = jnp.minimum(w / obs.ramp_dist, 1.0)
        rel = vel[:, None, :] - vob[None, :, :]
        acc = acc - obs.damping * jnp.sum(ramp[..., None] * rel, axis=1)

    return acc
