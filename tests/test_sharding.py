"""Multi-device domain decomposition on the virtual 8-CPU mesh
(SURVEY.md §7.3: the fake-backend archetype — emulate 8 chips on one host,
like the reference's StubPool emulates a DB server without a cluster)."""

import jax
import numpy as np
import pytest

from sph_pie_tpu.neighbors import binned as nb
from sph_pie_tpu.parallel import sharding
from sph_pie_tpu.scenes import builders
from sph_pie_tpu.solvers import wcsph_binned

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 virtual devices"
)


def _scene():
    return builders.dam_break_2d(n_target=1024, viscosity=0.05)


@pytest.mark.heavy
def test_sharded_step_matches_single_device():
    scene = _scene()
    mesh = sharding.make_mesh(8)
    b0 = scene.binned_state()

    # single device
    b_single = b0
    for _ in range(10):
        b_single = wcsph_binned.step(scene.params, scene.bgrid, b_single)

    # 8-way spatial sharding
    b_shard = sharding.shard_binned(mesh, scene.bgrid, b0)
    step = sharding.sharded_step(mesh, scene.params, scene.bgrid)
    for _ in range(10):
        b_shard = step(b_shard)

    np.testing.assert_allclose(
        np.asarray(b_shard.pos), np.asarray(b_single.pos), rtol=0, atol=1e-6
    )
    assert int(b_shard.overflow) == int(b_single.overflow) == 0


@pytest.mark.heavy
def test_sharded_simulate_includes_rebin():
    """Roll enough steps that the distributed rebin (sorted re-bin under the
    partitioner) actually triggers, and verify no particles are lost."""
    scene = _scene()
    mesh = sharding.make_mesh(8)
    b = sharding.shard_binned(mesh, scene.bgrid, scene.binned_state())
    sim = sharding.sharded_simulate(mesh, scene.params, scene.bgrid)
    b = sim(b, 100)
    assert int(b.overflow) == 0
    st = nb.unbin(scene.bgrid, b, scene.state.capacity)
    act = np.asarray(st.active)
    assert act.sum() == int(scene.state.n_active())
    assert np.isfinite(np.asarray(st.pos)[act]).all()


def test_mesh_creation_bounds():
    with pytest.raises(ValueError):
        sharding.make_mesh(10_000)


@pytest.mark.heavy
def test_sharded_pbf_matches_single_device():
    """PBF under the 8-way spatial decomposition == single-device PBF.

    Exercises the constraint-iteration folds, the owner-indexed stashes
    (cross-shard gathers), and mid-step light rebins under GSPMD."""
    from sph_pie_tpu.solvers import pbf

    scene = _scene()
    pp = pbf.flagship_params()
    mesh = sharding.make_mesh(8)
    b0 = scene.binned_state()
    sim = sharding.sharded_pbf_simulate(mesh, scene.params, scene.bgrid, pp)

    # Tolerances: GSPMD changes fusion/FMA-contraction decisions, and the
    # projection cap is a near-discontinuity that amplifies ulp noise
    # chaotically (measured: 5.6e-9 @ 1 step, 1.1e-5 @ 10, 4e-4 @ 20).
    for steps, atol in ((1, 1e-7), (10, 1e-4)):
        b_single = pbf.simulate(scene.params, scene.bgrid, pp, b0, steps)
        b_shard = sim(sharding.shard_binned(mesh, scene.bgrid, b0), steps)
        assert int(b_shard.overflow) == int(b_single.overflow) == 0
        st_s = nb.unbin(scene.bgrid, b_single, scene.state.capacity)
        st_m = nb.unbin(scene.bgrid, b_shard, scene.state.capacity)
        act = np.asarray(st_s.active)
        np.testing.assert_array_equal(act, np.asarray(st_m.active))
        np.testing.assert_allclose(
            np.asarray(st_m.pos)[act],
            np.asarray(st_s.pos)[act],
            rtol=0,
            atol=atol,
        )
