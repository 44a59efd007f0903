"""CPU/NumPy oracle stepper — the trajectory-match reference.

BASELINE.md requires the 2D dam break to match a CPU reference trajectory to
1e-3 over 1k steps. The mounted reference repo contains no SPH code
(SURVEY.md §0), so per SURVEY.md §6 the oracle is defined here, as part of
the framework's test rig (the reference's own testing style: a seeded
scratch-engine harness, `scripts/simulate-archive.js` — SURVEY.md §4).

This is a dense O(N^2) vectorised NumPy implementation that mirrors the
TPU engine's math **term for term and in the same order** (same kernels and
constants, same EOS clamp, same masks, same integration order), documented
so the comparison is meaningful (SURVEY.md §7.4 item 4). Run in float64 it
serves as the precision reference; the engine's own f32/f64 parity is
tested separately.
"""

from __future__ import annotations

import math

import numpy as np


def _poly6_coeff(dim, h):
    return 4.0 / (math.pi * h**8) if dim == 2 else 315.0 / (64.0 * math.pi * h**9)


def _spiky_grad_coeff(dim, h):
    return -30.0 / (math.pi * h**5) if dim == 2 else -45.0 / (math.pi * h**6)


def _visc_lap_coeff(dim, h):
    return 40.0 / (math.pi * h**5) if dim == 2 else 45.0 / (math.pi * h**6)


def _cohesion(dim, h, r):
    k = 32.0 / (math.pi * h ** (9 if dim == 3 else 8))
    hr3 = np.maximum(h - r, 0.0) ** 3
    r3 = r**3
    c = np.where(r <= 0.5 * h, 2.0 * hr3 * r3 - h**6 / 64.0, hr3 * r3)
    return np.where((r > 0.0) & (r < h), k * c, 0.0)


class OracleSim:
    """Dense-pair NumPy mirror of sph_pie_tpu.solvers.wcsph.step."""

    def __init__(self, params, pos, vel, mass, dtype=np.float64, obstacles=None):
        self.dim = int(params.dim)
        self.gamma = int(params.eos_gamma)
        f = lambda v: np.asarray(v, dtype)
        self.h = float(params.h)
        self.dt = f(params.dt)
        self.rho0 = f(params.rest_density)
        self.c0 = f(params.sound_speed)
        self.mu = f(params.viscosity)
        self.xsph_eps = f(params.xsph_eps)
        self.st = f(params.surface_tension)
        self.gravity = f(params.gravity)
        self.bmin = f(params.bound_min)
        self.bmax = f(params.bound_max)
        self.bk = f(params.boundary_stiffness)
        self.bc = f(params.boundary_damping)
        self.vcap = f(params.max_speed)
        self.B = self.rho0 * self.c0**2 / self.gamma
        self.pos = np.array(pos, dtype)
        self.vel = np.array(vel, dtype)
        self.mass = np.array(mass, dtype)
        self.dtype = dtype
        self.obstacles = obstacles  # scenes.obstacles.Obstacles or None

    def step(self):
        dim, h = self.dim, self.h
        h2 = h * h
        tiny = 1e-12
        pos, vel, mass = self.pos, self.vel, self.mass

        d = pos[:, None, :] - pos[None, :, :]          # x_ij [N, N, dim]
        r2 = np.sum(d * d, axis=-1)

        # --- density (self term included) + floor ---
        w = _poly6_coeff(dim, h) * np.maximum(h2 - r2, 0.0) ** 3
        rho = np.maximum((mass[None, :] * w).sum(axis=1), 1e-6 * self.rho0)

        # --- Tait EOS with free-surface clamp ---
        prs = np.maximum(self.B * ((rho / self.rho0) ** self.gamma - 1.0), 0.0)

        # --- pair forces ---
        live = (r2 < h2) & (r2 > tiny)
        r = np.sqrt(np.maximum(r2, tiny))
        rhat = d / r[..., None]
        m_j = np.where(live, mass[None, :], 0.0)
        inv_rho_j = 1.0 / rho[None, :]

        gw = _spiky_grad_coeff(dim, h) * np.maximum(h - r, 0.0) ** 2
        p_term = prs[:, None] / rho[:, None] ** 2 + prs[None, :] * inv_rho_j**2
        acc = -np.sum((m_j * p_term * gw)[..., None] * rhat, axis=1)

        dv = vel[None, :, :] - vel[:, None, :]
        lap = _visc_lap_coeff(dim, h) * np.maximum(h - r, 0.0)
        visc_w = m_j * inv_rho_j * lap
        acc += (self.mu / rho[:, None]) * np.sum(visc_w[..., None] * dv, axis=1)

        coh = _cohesion(dim, h, r)
        acc -= self.st * np.sum((m_j * coh)[..., None] * rhat, axis=1)

        xw = np.where(live, mass[None, :] * inv_rho_j * w, 0.0)
        xsph = np.sum(xw[..., None] * dv, axis=1)

        # --- gravity + boundary penalty (damping ramps over 0.1h; see
        # solvers/wcsph.py boundary_accel for why it must be continuous) ---
        acc += self.gravity
        pen_lo = np.maximum(self.bmin - pos, 0.0)
        pen_hi = np.maximum(pos - self.bmax, 0.0)
        pen = np.max(pen_lo + pen_hi, axis=-1, keepdims=True)
        ramp = np.minimum(pen / (0.1 * self.h), 1.0)
        acc += self.bk * (pen_lo - pen_hi) - self.bc * ramp * vel
        if self.obstacles is not None:
            acc += self._obstacle_accel(pos, vel)

        # --- symplectic Euler + CFL speed clamp + XSPH advection ---
        v = vel + self.dt * acc
        speed2 = np.sum(v * v, axis=-1, keepdims=True)
        scale = np.where(speed2 > self.vcap**2, self.vcap / np.sqrt(speed2), 1.0)
        self.vel = v * scale
        self.pos = pos + self.dt * (self.vel + self.xsph_eps * xsph)
        self.density, self.pressure = rho, prs

    def _obstacle_accel(self, pos, vel):
        """NumPy mirror of scenes.obstacles.accel."""
        ob = self.obstacles
        acc = np.zeros_like(pos)
        max_pen = np.zeros(pos.shape[0], self.dtype)
        sc = np.asarray(ob.sphere_center, self.dtype)
        if sc.shape[0]:
            sr = np.asarray(ob.sphere_radius, self.dtype)
            d = pos[:, None, :] - sc[None, :, :]
            dist = np.sqrt(np.maximum((d * d).sum(-1), 1e-12))
            pen = np.maximum(sr[None, :] - dist, 0.0)
            nrm = d / dist[..., None]
            acc += float(ob.stiffness) * (pen[..., None] * nrm).sum(1)
            max_pen = np.maximum(max_pen, pen.max(1))
        bl = np.asarray(ob.box_lo, self.dtype)
        if bl.shape[0]:
            bh = np.asarray(ob.box_hi, self.dtype)
            p = pos[:, None, :]
            inside = ((p > bl[None]) & (p < bh[None])).all(-1)
            d_lo = p - bl[None]
            d_hi = bh[None] - p
            d_face = np.minimum(d_lo, d_hi)
            min_ax = np.argmin(d_face, -1)
            pen = np.min(d_face, -1)
            sign = np.where(
                np.take_along_axis(d_lo, min_ax[..., None], -1)
                <= np.take_along_axis(d_hi, min_ax[..., None], -1),
                -1.0,
                1.0,
            )[..., 0]
            push = sign[..., None] * np.eye(pos.shape[-1], dtype=self.dtype)[min_ax]
            w = np.where(inside, pen, 0.0)
            acc += float(ob.stiffness) * (w[..., None] * push).sum(1)
            max_pen = np.maximum(max_pen, w.max(1))
        ramp = np.minimum(max_pen / float(ob.ramp_dist), 1.0)
        acc -= float(ob.damping) * ramp[:, None] * vel
        return acc

    def run(self, n_steps: int):
        for _ in range(n_steps):
            self.step()
        return self.pos


def oracle_from_scene(scene, dtype=np.float64) -> OracleSim:
    """Build an oracle over a Scene's *active* particles."""
    act = np.asarray(scene.state.active)
    return OracleSim(
        scene.params,
        np.asarray(scene.state.pos)[act],
        np.asarray(scene.state.vel)[act],
        np.asarray(scene.state.mass)[act],
        dtype=dtype,
    )
