"""PBF solver: incompressibility + stability invariants."""

import numpy as np

from sph_pie_tpu.neighbors import binned as nb
from sph_pie_tpu.scenes import builders
from sph_pie_tpu.solvers import pbf


def _scene():
    return builders.dam_break_2d(n_target=400)


def test_pbf_settles_incompressible():
    scene = _scene()
    pp = pbf.make_pbf_params(iters=4)
    b = scene.binned_state()
    b = pbf.simulate(scene.params, scene.bgrid, pp, b, 200)
    assert int(b.overflow) == 0
    st = nb.unbin(scene.bgrid, b, scene.state.capacity)
    act = np.asarray(st.active)
    pos = np.asarray(st.pos)[act]
    rho = np.asarray(st.density)[act]
    rho0 = float(scene.params.rest_density)
    assert np.isfinite(pos).all()
    # PBF enforces rho <= ~rho0: bulk should sit near rest density and
    # never grossly compress.
    assert np.quantile(rho, 0.9) < 1.15 * rho0
    # particles stay in the box (PBF projects into bounds)
    assert (pos >= np.asarray(scene.params.bound_min) - 1e-6).all()
    assert (pos <= np.asarray(scene.params.bound_max) + 1e-6).all()


def test_pbf_column_collapses():
    """The dam column must actually flow (x spread grows) — i.e. the solver
    isn't frozen by the constraint projection."""
    scene = _scene()
    pp = pbf.make_pbf_params(iters=3)
    b = scene.binned_state()
    x0 = np.asarray(scene.state.pos)[np.asarray(scene.state.active)][:, 0].max()
    b = pbf.simulate(scene.params, scene.bgrid, pp, b, 250)
    st = nb.unbin(scene.bgrid, b, scene.state.capacity)
    x1 = np.asarray(st.pos)[np.asarray(st.active)][:, 0].max()
    assert x1 > x0 + 5 * float(scene.params.h)


def test_pbf_respects_obstacles():
    from sph_pie_tpu.scenes import obstacles as obs_lib

    scene = _scene()
    obs = obs_lib.make(2, spheres=[([0.2, 0.1], 0.07)])
    pp = pbf.make_pbf_params(iters=3)
    b = scene.binned_state()
    b = pbf.simulate(scene.params, scene.bgrid, pp, b, 200, obs)
    st = nb.unbin(scene.bgrid, b, scene.state.capacity)
    pos = np.asarray(st.pos)[np.asarray(st.active)]
    d = np.sqrt(((pos - np.array([0.2, 0.1])) ** 2).sum(-1))
    assert (d > 0.07 - 3 * float(scene.params.h)).all()
