"""Periodic domains in the binned engine vs minimum-image brute force.

The effective period per periodic axis is dims*cell_size (cells must tile
the box; the grid rounds the requested length UP to a whole cell count) —
the tests build lattices that fill that effective box exactly.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from sph_pie_tpu.core import state as state_lib
from sph_pie_tpu.neighbors import binned as nb
from sph_pie_tpu.core.params import make_params
from sph_pie_tpu.solvers import wcsph_binned


def _periodic_setup(seed=0):
    """Random particles in a fully periodic 2D box."""
    rng = np.random.default_rng(seed)
    h = 0.1
    cell = h * 1.25
    nx = 8  # cells per axis; L = nx * cell exactly
    L = nx * cell
    n = 250
    pos = rng.uniform(0, L, size=(n, 2)).astype(np.float32)
    vel = rng.normal(0, 0.1, size=(n, 2)).astype(np.float32)
    params = make_params(
        dim=2, h=h, dt=1e-4, bound_min=[0, 0], bound_max=[L, L],
        viscosity=0.05,
    )
    grid = nb.binned_grid_from_bounds(
        [0, 0], [L, L], h=h, cap=32, skin_frac=0.25,
        max_particles=n, periodic=(True, True),
    )
    # skin_frac makes cell bigger than assumed; rebuild L accordingly
    return params, grid, pos, vel


def _min_image(d, L):
    return d - L * np.round(d / L)


def test_periodic_density_matches_min_image():
    params, grid, pos, vel = _periodic_setup()
    n = pos.shape[0]
    st = state_lib.from_positions(jnp.asarray(pos), capacity=n, mass=1.0)
    b = nb.bin_state(grid, st)
    b = nb.wrap_ghosts(grid, b)
    rho = np.asarray(wcsph_binned._density(params, grid, b))
    owner = np.asarray(b.owner)
    valid = np.asarray(b.valid) & (owner >= 0)

    # brute-force minimum-image density over the EFFECTIVE period
    order = grid.axis_order or (0, 1)
    Ls = np.zeros(2)
    for g in range(2):
        Ls[order[g]] = grid.dims[g] * grid.cell_size
    h = float(params.h)
    d = pos[:, None, :] - pos[None, :, :]
    for k in range(2):
        d[..., k] = _min_image(d[..., k], Ls[k])
    r2 = (d ** 2).sum(-1)
    w = np.where(r2 < h * h, (4.0 / (np.pi * h ** 8)) * (h * h - r2) ** 3, 0.0)
    rho_ref = w.sum(1)  # mass 1, self term included

    got = np.full(n, np.nan)
    # ghost images share owners; interior slots take precedence — use
    # slot_of to pick each particle's home slot
    slot_of = np.asarray(b.slot_of)[:n]
    got = rho[slot_of]
    np.testing.assert_allclose(got, rho_ref, rtol=2e-5)


def test_periodic_step_conserves_and_wraps():
    """A drifting periodic fluid stays finite, keeps all particles, and
    positions re-enter the primary box after rebins."""
    params, grid, pos, vel = _periodic_setup(seed=3)
    n = pos.shape[0]
    st = state_lib.from_positions(jnp.asarray(pos), capacity=n, mass=1.0)
    from sph_pie_tpu.utils.struct import replace as srep
    st = srep(st, vel=jnp.zeros_like(st.vel) + jnp.asarray([0.5, 0.0]))
    b = nb.bin_state(grid, st)
    b = wcsph_binned.simulate(params, grid, b, 300)
    assert int(b.overflow) == 0
    out = nb.unbin(grid, b, n)
    act = np.asarray(out.active)
    assert act.sum() == n  # nobody fell off the world
    p = np.asarray(out.pos)[act]
    assert np.isfinite(p).all()
    order = grid.axis_order or (0, 1)
    for g in range(2):
        L = grid.dims[g] * grid.cell_size
        ax = order[g]
        assert p[:, ax].min() > -L and p[:, ax].max() < 2 * L


@pytest.mark.heavy
def test_periodic_pbf_drifts_and_wraps():
    """PBF in a fully periodic box: drifting flow stays finite, keeps all
    particles, and densities stay near rest (constraint active through
    the wrap seams)."""
    from sph_pie_tpu.solvers import pbf

    params, grid, pos, vel = _periodic_setup(seed=7)
    n = pos.shape[0]
    st = state_lib.from_positions(jnp.asarray(pos), capacity=n, mass=1.0)
    from sph_pie_tpu.utils.struct import replace as srep
    st = srep(st, vel=jnp.zeros_like(st.vel) + jnp.asarray([0.4, 0.0]))
    pp = pbf.make_pbf_params(iters=3)
    b = nb.bin_state(grid, st)
    b = pbf.simulate(params, grid, pp, b, 200)
    assert int(b.overflow) == 0
    out = nb.unbin(grid, b, n)
    act = np.asarray(out.active)
    assert act.sum() == n
    p = np.asarray(out.pos)[act]
    assert np.isfinite(p).all()


def test_periodic_pbf_seam_crossing_velocity_min_image():
    """Particles wrapping across the periodic seam must keep their true
    physical velocity, not the rebin-folded (x_star - pos0)/dt that is off
    by ~L/dt. dt is sized so (a) every step's displacement exceeds skin/2
    — mid-step rebins fire constantly — and (b) the bulk drift crosses the
    seam repeatedly during the run. Without the minimum-image correction
    in pbf.step this saturates the max_speed clamp pointing backwards."""
    from sph_pie_tpu.solvers import pbf

    params, grid, pos, vel = _periodic_setup(seed=11)
    n = pos.shape[0]
    drift = 0.4
    # Each step moves ~drift*dt = 0.02 > skin/2 = 0.0125 -> rebin fires
    # every maybe_rebin call; 60 steps drift 1.2 box lengths.
    params = make_params(
        dim=2,
        h=0.1,
        dt=0.05,
        bound_min=[0, 0],
        bound_max=[float(grid.dims[0]) * grid.cell_size] * 2,
        viscosity=0.05,
        gravity=[0.0, 0.0],
    )
    st = state_lib.from_positions(jnp.asarray(pos), capacity=n, mass=1.0)
    from sph_pie_tpu.utils.struct import replace as srep

    st = srep(st, vel=jnp.zeros_like(st.vel) + jnp.asarray([drift, 0.0]))
    pp = pbf.make_pbf_params(iters=3)
    b = nb.bin_state(grid, st)
    b = pbf.simulate(params, grid, pp, b, 60)
    assert int(b.n_rebins) > 10  # the trigger condition actually fired
    out = nb.unbin(grid, b, n)
    act = np.asarray(out.active)
    assert act.sum() == n
    v = np.asarray(out.vel)[act]
    assert np.isfinite(v).all()
    speed = np.sqrt((v**2).sum(-1))
    # Physical bound: drift + per-step projection noise (iters * proj_cap
    # / dt = 3*0.0125/0.05 = 0.75). The bug produces ~max_speed (= c0,
    # default 10*max_speed_est >> 2) on every wrapped particle.
    assert speed.max() < 2.0, speed.max()
    # and the bulk keeps moving forward, not bounced backwards
    assert v[:, 0].mean() > 0.5 * drift


@pytest.mark.heavy  # compile-heavy 8-device equivalence (~40 s); default
# tier keeps test_periodic_density_matches_min_image +
# test_periodic_step_conserves_and_wraps on the periodic path and
# test_halo.py on the sharded halo path
def test_periodic_halo_8dev_matches_single_device():
    """Periodic x sharding (VERDICT r02 #7): a fully periodic drifting box
    stepped by the explicit 8-device halo path must match the
    single-device binned engine per particle (min-image on the deltas —
    rebin cadence may differ between the paths, folding one trajectory's
    positions into the primary box earlier than the other's)."""
    import jax

    if jax.device_count() < 8:
        import pytest

        pytest.skip("needs 8 virtual devices")
    from sph_pie_tpu.parallel import halo, sharding
    from sph_pie_tpu.utils.struct import replace as srep

    rng = np.random.default_rng(5)
    h = 0.1
    cell = h * 1.25
    nx, ny = 10, 6  # padded (12, 8): 96 cells, 12/device >= halo 9
    Lx, Ly = nx * cell, ny * cell
    n = 220
    pos = rng.uniform(0, [Lx, Ly], size=(n, 2)).astype(np.float32)
    params = make_params(
        dim=2, h=h, dt=2e-3, bound_min=[0, 0], bound_max=[Lx, Ly],
        viscosity=0.05, gravity=[0.0, 0.0],
    )
    grid = nb.binned_grid_from_bounds(
        [0, 0], [Lx, Ly], h=h, cap=32, skin_frac=0.25,
        max_particles=n, periodic=(True, True),
    )
    assert grid.num_cells % 8 == 0
    st = state_lib.from_positions(jnp.asarray(pos), capacity=n, mass=1.0)
    st = srep(st, vel=jnp.zeros_like(st.vel) + jnp.asarray([0.3, 0.2]))

    n_steps = 120  # drift ~0.072 = several rebins, both axes cross seams
    b_ref = wcsph_binned.simulate(
        params, grid, nb.bin_state(grid, st), n_steps
    )
    mesh = sharding.make_mesh(8)
    step, run = halo.make_halo_step(mesh, params, grid)
    b_halo = run(
        sharding.shard_binned(mesh, grid, nb.bin_state(grid, st)), n_steps
    )

    out_ref = nb.unbin(grid, b_ref, n)
    out_halo = nb.unbin(grid, b_halo, n)
    assert int(b_ref.overflow) == 0 and int(b_halo.overflow) == 0
    a_ref = np.asarray(out_ref.active)
    a_halo = np.asarray(out_halo.active)
    assert a_ref.sum() == n and a_halo.sum() == n
    d = np.asarray(out_halo.pos) - np.asarray(out_ref.pos)
    for ax, L in enumerate((Lx, Ly)):
        d[:, ax] = _min_image(d[:, ax], L)
    assert np.abs(d).max() < 5e-6, np.abs(d).max()
    dv = np.asarray(out_halo.vel) - np.asarray(out_ref.vel)
    assert np.abs(dv).max() < 5e-5, np.abs(dv).max()


@pytest.mark.heavy
def test_periodic_pbf_epilogue_ride_matches_gather():
    """The epilogue="ride" payload scheme must survive periodic wrapping:
    ghost slots copy the UNOFFSET pos0/density payloads (wrap_ghosts) and
    the min-image epilogue corrects the +-L displacement — exactly the
    gather scheme's semantics, so a seam-crossing drifting run must match
    per particle."""
    from sph_pie_tpu.solvers import pbf
    from sph_pie_tpu.utils.struct import replace as srep

    params, grid, pos, vel = _periodic_setup(seed=13)
    n = pos.shape[0]
    st = state_lib.from_positions(jnp.asarray(pos), capacity=n, mass=1.0)
    st = srep(st, vel=jnp.zeros_like(st.vel) + jnp.asarray([0.4, 0.0]))
    outs = {}
    for mode in ("gather", "ride"):
        pp = pbf.make_pbf_params(iters=2, epilogue=mode)
        b = pbf.simulate(params, grid, pp, nb.bin_state(grid, st), 80)
        assert int(b.overflow) == 0
        assert int(b.n_rebins) > 5
        out = nb.unbin(grid, b, n)
        act = np.asarray(out.active)
        assert act.sum() == n
        outs[mode] = (np.asarray(out.pos)[act], np.asarray(out.vel)[act])
    for a, b_ in zip(outs["gather"], outs["ride"]):
        np.testing.assert_allclose(a, b_, rtol=0, atol=1e-6)
