"""Explicit ppermute halo-exchange path vs single-device ground truth."""

import dataclasses

import jax
import numpy as np
import pytest

from sph_pie_tpu.neighbors import binned as nb
from sph_pie_tpu.parallel import halo, sharding
from sph_pie_tpu.scenes import builders
from sph_pie_tpu.solvers import wcsph_binned

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 virtual devices"
)


def _scene8():
    """Scene whose padded cell count divides by 8."""
    scene = builders.dam_break_2d(n_target=1024, viscosity=0.05)
    g = scene.bgrid
    # pad the leading axis so num_cells % 8 == 0 (extra cells stay empty)
    d0 = g.dims[0]
    while (d0 + 2) * (g.dims[1] + 2) % 8:
        d0 += 1
    g = dataclasses.replace(g, dims=(d0, g.dims[1]))
    return dataclasses.replace(scene, bgrid=g)


def test_grid_divisibility_guard():
    scene = builders.dam_break_2d(n_target=256)
    mesh = sharding.make_mesh(8)
    if scene.bgrid.num_cells % 8:
        with pytest.raises(ValueError):
            halo.make_halo_step(mesh, scene.params, scene.bgrid)


@pytest.mark.heavy
def test_halo_step_matches_single_device():
    scene = _scene8()
    assert scene.bgrid.num_cells % 8 == 0
    mesh = sharding.make_mesh(8)
    step, _ = halo.make_halo_step(mesh, scene.params, scene.bgrid)

    b_ref = scene.binned_state()
    b_halo = sharding.shard_binned(mesh, scene.bgrid, scene.binned_state())
    for _ in range(10):
        b_ref = wcsph_binned.step(scene.params, scene.bgrid, b_ref)
        b_halo = jax.jit(step)(b_halo)
    np.testing.assert_allclose(
        np.asarray(b_halo.pos), np.asarray(b_ref.pos), rtol=0, atol=1e-6
    )
    # shard-edge reductions associate differently: rounding-level only
    np.testing.assert_allclose(
        np.asarray(b_halo.density), np.asarray(b_ref.density), rtol=1e-5
    )


@pytest.mark.heavy
def test_halo_run_with_rebin_preserves_particles():
    scene = _scene8()
    mesh = sharding.make_mesh(8)
    _, run = halo.make_halo_step(mesh, scene.params, scene.bgrid)
    b = sharding.shard_binned(mesh, scene.bgrid, scene.binned_state())
    b = run(b, 120)  # long enough to trigger rebins
    assert int(b.overflow) == 0
    st = nb.unbin(scene.bgrid, b, scene.state.capacity)
    act = np.asarray(st.active)
    assert act.sum() == int(scene.state.n_active())
    assert np.isfinite(np.asarray(st.pos)[act]).all()


def test_halo_step_moving_obstacle_matches_single_device():
    """sim_time threads through the shard_map: a MOVING obstacle gives the
    same trajectory on the 8-device halo path as single-device."""
    from sph_pie_tpu.scenes import obstacles as obs_lib

    scene = _scene8()
    mesh = sharding.make_mesh(8)
    obs = obs_lib.make(
        2,
        spheres=[([0.3, 0.2], 0.07)],
        sphere_motions=[([0.0, 0.0], [0.05, 0.0], 10.0, 0.0)],
    )
    step, _ = halo.make_halo_step(mesh, scene.params, scene.bgrid, obstacles=obs)

    b_ref = scene.binned_state()
    b_halo = sharding.shard_binned(mesh, scene.bgrid, scene.binned_state())
    for _ in range(10):
        b_ref = wcsph_binned.step(scene.params, scene.bgrid, b_ref, obs)
        b_halo = jax.jit(step)(b_halo)
    assert float(b_halo.sim_time) > 0
    np.testing.assert_allclose(
        np.asarray(b_halo.pos), np.asarray(b_ref.pos), rtol=0, atol=1e-6
    )
