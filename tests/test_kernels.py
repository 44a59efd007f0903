"""Unit tests: smoothing kernel closed-form properties (SURVEY.md §7.3)."""

import math

import jax.numpy as jnp
import numpy as np

from sph_pie_tpu.kernels import smoothing


def _radial_integral(fn, dim, h, n=200_000):
    """Integrate fn(r) over the d-ball of radius h (radial quadrature)."""
    r = (np.arange(n) + 0.5) * (h / n)
    shell = 2.0 * math.pi * r if dim == 2 else 4.0 * math.pi * r**2
    return float(np.sum(fn(r) * shell) * (h / n))


def test_poly6_normalised_2d():
    h = 0.1
    total = _radial_integral(lambda r: np.asarray(smoothing.poly6(2, h, jnp.asarray(r * r))), 2, h)
    assert abs(total - 1.0) < 1e-4


def test_poly6_normalised_3d():
    h = 0.1
    total = _radial_integral(lambda r: np.asarray(smoothing.poly6(3, h, jnp.asarray(r * r))), 3, h)
    assert abs(total - 1.0) < 1e-4


def test_poly6_compact_support():
    h = 0.2
    assert float(smoothing.poly6(2, h, jnp.asarray(h * h))) == 0.0
    assert float(smoothing.poly6(3, h, jnp.asarray(4.0 * h * h))) == 0.0
    assert float(smoothing.poly6(2, h, jnp.asarray(0.0))) > 0.0


def test_spiky_gradient_sign_and_support():
    h = 0.15
    r = jnp.asarray([0.01, 0.05, 0.1, h, 2 * h])
    g = smoothing.spiky_grad_mag(2, h, r)
    assert np.all(np.asarray(g[:3]) < 0.0)  # attractive toward decreasing r
    assert np.allclose(np.asarray(g[3:]), 0.0)


def test_visc_lap_nonneg_and_support():
    h = 0.15
    r = jnp.asarray([0.0, 0.07, h, 3 * h])
    lap = smoothing.visc_lap(3, h, r)
    assert np.all(np.asarray(lap) >= 0.0)
    assert np.allclose(np.asarray(lap[2:]), 0.0)


def test_cohesion_support_and_continuity():
    h = 0.1
    # zero outside support and at r=0 (masked)
    assert float(smoothing.cohesion(3, h, jnp.asarray(0.0))) == 0.0
    assert float(smoothing.cohesion(3, h, jnp.asarray(h))) == 0.0
    # continuous across the r = h/2 branch point
    eps = 1e-7
    lo = float(smoothing.cohesion(3, h, jnp.asarray(0.5 * h - eps)))
    hi = float(smoothing.cohesion(3, h, jnp.asarray(0.5 * h + eps)))
    assert abs(lo - hi) < 1e-3 * max(abs(lo), abs(hi), 1e-30)
