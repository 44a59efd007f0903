"""Frozen ghost boundary particles (no-slip walls, physics-depth item)."""

import numpy as np
import pytest

from sph_pie_tpu.neighbors import binned as nb
from sph_pie_tpu.scenes import dam_break_2d
from sph_pie_tpu.solvers import wcsph_binned


def _scene():
    return dam_break_2d(n_target=400, wall_layers=2)


def test_ghost_scene_shapes():
    scene = _scene()
    assert scene.bgrid.n_boundary > 0
    bpos, bmass = scene.boundary
    assert bpos.shape[0] == scene.bgrid.n_boundary
    assert (np.asarray(bmass) > 0).all()
    # ghosts live OUTSIDE the domain AABB (open top)
    p = np.asarray(bpos)
    outside = (p < 0.0).any(axis=1) | (p[:, 0] > 1.0)
    assert outside.all()
    # no lid: any point above the top belongs to a side-wall column
    above = p[p[:, 1] > 1.0]
    assert ((above[:, 0] < 0.0) | (above[:, 0] > 1.0)).all()


@pytest.mark.heavy
def test_ghosts_never_move_and_fluid_stays_in_box():
    scene = _scene()
    g = scene.bgrid
    b0 = scene.binned_state()
    frozen0 = np.asarray(nb.frozen_mask(g, b0))
    ghost_pos0 = np.asarray(b0.pos)[frozen0]
    assert frozen0.sum() == g.n_boundary

    b = wcsph_binned.simulate(scene.params, g, b0, 400)
    # ghosts: identical positions (they may occupy different slots after a
    # rebin, so compare as sorted point sets)
    frozen = np.asarray(nb.frozen_mask(g, b))
    ghost_pos = np.asarray(b.pos)[frozen]
    assert ghost_pos.shape == ghost_pos0.shape

    def canon(a):
        return a[np.lexsort(a.T)]

    np.testing.assert_allclose(canon(ghost_pos), canon(ghost_pos0), atol=1e-7)

    st = nb.unbin(g, b, scene.state.capacity)
    pos = np.asarray(st.pos)[np.asarray(st.active)]
    assert np.isfinite(pos).all()
    dx = float(scene.params.h) / 2.0
    # ghost pressure keeps fluid essentially inside the box: penetration
    # bounded by ~a particle spacing rather than the penalty-spring depth
    assert pos.min() > -1.5 * dx
    assert pos[:, 0].max() < 1.0 + 1.5 * dx
    assert int(np.asarray(b.overflow)) == 0


@pytest.mark.heavy
def test_wall_density_near_rest():
    """Wall-adjacent fluid sees full kernel support through the ghosts, so
    its density sits near rest instead of the ~50% deficit bare walls give."""
    scene = _scene()
    g = scene.bgrid
    b = wcsph_binned.simulate(scene.params, g, b0 := scene.binned_state(), 600)
    st = nb.unbin(g, b, scene.state.capacity)
    act = np.asarray(st.active)
    pos = np.asarray(st.pos)[act]
    rho = np.asarray(st.density)[act]
    rest = float(scene.params.rest_density)
    floor_band = pos[:, 1] < 2.5 * float(scene.params.h)
    assert floor_band.sum() > 20
    mean_floor = rho[floor_band].mean()
    assert 0.9 * rest < mean_floor < 1.25 * rest
