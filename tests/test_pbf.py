"""PBF solver: incompressibility + stability invariants."""

import numpy as np
import pytest

from sph_pie_tpu.neighbors import binned as nb
from sph_pie_tpu.scenes import builders
from sph_pie_tpu.solvers import pbf


def _scene():
    return builders.dam_break_2d(n_target=400)


@pytest.mark.heavy
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


@pytest.mark.slow
def test_pbf_column_collapses():
    """The dam column must actually flow (x spread grows) — i.e. the solver
    isn't frozen by the constraint projection.

    Calibration note: the round-1 bar (5h of spread by t=0.077s) was only
    ever reachable by a projection blow-up (velocities saturating the
    40 m/s clamp); the trusted WCSPH solver reaches 0.43 by t=0.092s.
    The skin-guarantee rework (mid-iteration rebins + under-relaxed
    projections) produces physical speeds, measured xmax 0.467 at 500
    steps — the bar is 1.5h of spread at t=0.153s."""
    scene = _scene()
    pp = pbf.make_pbf_params(iters=4)
    b = scene.binned_state()
    x0 = np.asarray(scene.state.pos)[np.asarray(scene.state.active)][:, 0].max()
    b = pbf.simulate(scene.params, scene.bgrid, pp, b, 500)
    st = nb.unbin(scene.bgrid, b, scene.state.capacity)
    x1 = np.asarray(st.pos)[np.asarray(st.active)][:, 0].max()
    assert x1 > x0 + 1.5 * float(scene.params.h)
    # physical speeds: the blow-up mode saturated the 40 m/s clamp
    assert np.abs(np.asarray(st.vel)[np.asarray(st.active)]).max() < 10.0


@pytest.mark.slow
def test_pbf_flagship_config_quality():
    """The BENCH configuration (pbf.flagship_params — the exact params
    bench.py times at 1M) must pass the same calibrated physics bars as
    the default: the round-2 verdict caught a perf default that silently
    failed the dynamics bar because only the iters=4 default was gated.

    Bars (calibrated in scripts/sweep_pbf_iters.py): the dam column
    flows (> 1.5h spread at 500 steps), speeds stay physical (< 10 m/s;
    the blow-up mode saturated the 40 m/s clamp), and the bulk stays
    near rest density (q90 < 1.15 rho0, the settle-test bar)."""
    scene = _scene()
    pp = pbf.flagship_params()
    b = scene.binned_state()
    x0 = np.asarray(scene.state.pos)[np.asarray(scene.state.active)][:, 0].max()
    b = pbf.simulate(scene.params, scene.bgrid, pp, b, 500)
    assert int(b.overflow) == 0
    st = nb.unbin(scene.bgrid, b, scene.state.capacity)
    act = np.asarray(st.active)
    pos = np.asarray(st.pos)[act]
    rho = np.asarray(st.density)[act]
    assert np.isfinite(pos).all()
    assert pos[:, 0].max() > x0 + 1.5 * float(scene.params.h)
    assert np.abs(np.asarray(st.vel)[act]).max() < 10.0
    assert np.quantile(rho, 0.9) < 1.15 * float(scene.params.rest_density)


@pytest.mark.heavy
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


@pytest.mark.heavy
def test_pbf_vorticity_confinement():
    """omega matches a direct O(N^2) curl; enabling confinement keeps the
    sim finite and (3D) produces a force perpendicular to omega."""
    import jax.numpy as jnp

    from sph_pie_tpu.kernels import smoothing
    from sph_pie_tpu.neighbors import binned as nb
    from sph_pie_tpu.scenes import dam_break_3d
    from sph_pie_tpu.solvers import pbf

    scene = dam_break_3d(n_target=1200)
    g = scene.bgrid
    params = scene.params
    pp = pbf.make_pbf_params(iters=2, vort_eps=5.0)
    assert pp.use_vorticity

    b = scene.binned_state()
    b = pbf.simulate(params, g, pp, b, 5)
    valid = np.asarray(b.valid)
    assert np.isfinite(np.asarray(b.pos)[valid]).all()
    assert np.isfinite(np.asarray(b.vel)[valid]).all()

    # direct curl check on the binned state
    rho = jnp.maximum(b.density, 1e-6 * params.rest_density)
    omega = np.asarray(
        pbf._vorticity_fold(params, g, b.pos, b.vel, b.mass, rho)
    )
    pos = np.asarray(b.pos)[valid]
    vel = np.asarray(b.vel)[valid]
    mrho = np.asarray(b.mass / rho)[valid]
    h = float(params.h)
    d = pos[:, None, :] - pos[None, :, :]            # x_i - x_j
    r = np.sqrt((d**2).sum(-1))
    np.fill_diagonal(r, np.inf)
    gw = np.where(r < h, -45.0 / (np.pi * h**6) * (h - r) ** 2, 0.0) / r
    grad = gw[:, :, None] * d                        # grad_i W_ij
    dv = vel[None, :, :] - vel[:, None, :]           # v_j - v_i
    ref = (mrho[None, :, None] * np.cross(dv, grad)).sum(axis=1)
    got = omega[valid]
    scale = max(np.abs(ref).max(), 1e-12)
    np.testing.assert_allclose(got / scale, ref / scale, atol=5e-5)

    # confinement force: finite, and orthogonal to omega in 3D
    f = np.asarray(
        pbf._vorticity_force(params, g, b.pos, b.mass, rho, jnp.asarray(omega))
    )[valid]
    assert np.isfinite(f).all()
    dot = np.abs((f * omega[valid]).sum(-1))
    norm = np.linalg.norm(f, axis=-1) * np.linalg.norm(omega[valid], axis=-1)
    mask = norm > 1e-10
    assert (dot[mask] / norm[mask] < 1e-4).all()


def test_pbf_matches_bruteforce_oracle_f64():
    """Binned PBF == O(N^2) PbfOracle in f64 (cell list exactness + update
    order; only summation-order noise should remain)."""
    import jax
    import jax.numpy as jnp

    from sph_pie_tpu.oracle import PbfOracle

    with jax.enable_x64():
        scene = builders.dam_break_2d(n_target=300, dtype=jnp.float64)
        g = scene.bgrid
        pp = pbf.make_pbf_params(iters=3, dtype=jnp.float64)
        b = scene.binned_state()
        steps = 40
        b = pbf.simulate(scene.params, g, pp, b, steps)
        st = nb.unbin(g, b, scene.state.capacity)
        got = np.asarray(st.pos)[np.asarray(st.active)]

        act = np.asarray(scene.state.active)
        oracle = PbfOracle(
            scene.params,
            pp,
            np.asarray(scene.state.pos)[act],
            np.asarray(scene.state.vel)[act],
            np.asarray(scene.state.mass)[act],
            proj_cap=min(
                float(pp.proj_cap_h) * float(scene.params.h), 0.5 * g.skin
            ),
        )
        want = oracle.run(steps)
        err = np.abs(got - want).max()
        assert err < 1e-6, f"PBF binned vs oracle drift: {err}"


@pytest.mark.heavy
def test_pbf_epilogue_ride_matches_gather():
    """epilogue="ride" (payload-carried pos0/rho_prev) == epilogue="gather"
    (owner-indexed stashes): identical physics, different data movement.
    Same rebin cadence, same pair sums -> positions, velocities AND the
    diagnostic density must agree to fp noise over a multi-rebin run."""
    scene = _scene()
    outs = {}
    for mode in ("gather", "ride"):
        pp = pbf.flagship_params(epilogue=mode)
        b = pbf.simulate(scene.params, scene.bgrid, pp, scene.binned_state(), 60)
        assert int(b.overflow) == 0
        assert int(b.n_rebins) > 0  # the carried-payload path actually ran
        st = nb.unbin(scene.bgrid, b, scene.state.capacity)
        act = np.asarray(st.active)
        outs[mode] = (
            np.asarray(st.pos)[act],
            np.asarray(st.vel)[act],
            np.asarray(st.density)[act],
        )
    for a, b_ in zip(outs["gather"], outs["ride"]):
        np.testing.assert_allclose(a, b_, rtol=0, atol=1e-6)


def test_pbf_flagship_quality_guard_default_tier():
    """DEFAULT-TIER quality gate on pbf.flagship_params() — the exact
    config bench.py times at 1M (VERDICT r03 #4).

    Why it exists: round 3 briefly shipped perf tuples that failed the
    500-step slow-tier physics bars, and default CI never noticed because
    every PBF quality test was slow/heavy-marked. This short-horizon bar
    runs in ~1 min on the 1-CPU mesh and was calibrated
    (scripts/calib_pbf_guard.py, n_target=300, 350 steps) to separate the
    shipped config from both retracted tuples:

        config                 spread   vmax   rho_q90
        flagship (2,0.9,.0625)  2.40h   5.98    1.018   <- must pass
        retracted (3,0.8,1/24)  0.71h   5.58    1.015   <- fails spread
        retracted (3,0.8,.0625) 3.21h  10.09    1.015   <- fails vmax
        default   (4,0.8,.075)  1.41h   1.68    1.015   (slow-tier gated)

    Bars: spread > 1.2h (column actually flows), vmax < 9 (no projection
    blow-up riding the speed clamp), rho_q90 < 1.10 (bulk stays near
    rest). The full 500-step bars remain in the slow tier."""
    scene = builders.dam_break_2d(n_target=300)
    pp = pbf.flagship_params()
    b = scene.binned_state()
    x0 = np.asarray(scene.state.pos)[np.asarray(scene.state.active)][:, 0].max()
    b = pbf.simulate(scene.params, scene.bgrid, pp, b, 350)
    assert int(b.overflow) == 0
    st = nb.unbin(scene.bgrid, b, scene.state.capacity)
    act = np.asarray(st.active)
    pos = np.asarray(st.pos)[act]
    h = float(scene.params.h)
    assert np.isfinite(pos).all()
    spread = (pos[:, 0].max() - x0) / h
    assert spread > 1.2, f"flagship config froze: spread {spread:.2f}h"
    vmax = np.abs(np.asarray(st.vel)[act]).max()
    assert vmax < 9.0, f"flagship config blows up: vmax {vmax:.2f}"
    q90 = np.quantile(np.asarray(st.density)[act], 0.9)
    assert q90 < 1.10 * float(scene.params.rest_density), q90
