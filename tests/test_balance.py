"""Load-balanced resort (BASELINE config #5) on the virtual 8-device mesh."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sph_pie_tpu.neighbors import binned as nb
from sph_pie_tpu.parallel import balance
from sph_pie_tpu.scenes import dam_break_2d
from sph_pie_tpu.solvers import wcsph_binned

N_DEV = 8


@pytest.fixture(scope="module")
def mesh():
    if jax.device_count() < N_DEV:
        pytest.skip("needs 8 virtual devices")
    from jax.sharding import Mesh

    return Mesh(jax.devices()[:N_DEV], ("x",))


def test_balanced_splits_synthetic():
    # all particles in the first 10% of cells (settled dam, gravity-first)
    counts = np.zeros(1000, np.int32)
    counts[:100] = 50
    c_cap = 2 * 1000 // N_DEV
    starts = balance.balanced_splits(counts, N_DEV, c_cap)
    assert starts[0] == 0 and starts[-1] == 1000
    widths = np.diff(starts)
    assert (widths >= 0).all() and (widths <= c_cap).all()
    bf = balance.balance_factor(counts, starts)
    bf_equal = balance.balance_factor(
        counts, np.arange(0, 1001, 125, dtype=np.int64)
    )
    # contiguity + c_cap=2C/n bound the optimum at n/k = 2.0 here (the
    # empty 90% must occupy >= 4 trailing devices); the minimax search
    # must reach that bound
    assert bf <= 2.01
    assert bf_equal > 6.0    # equal-cells is catastrophically skewed
    # a roomier cell budget buys better balance
    starts_4x = balance.balanced_splits(counts, N_DEV, 4 * 1000 // N_DEV)
    assert balance.balance_factor(counts, starts_4x) <= 1.35
    # every cell covered exactly once
    total = sum(counts[starts[d]:starts[d + 1]].sum() for d in range(N_DEV))
    assert total == counts.sum()


@pytest.mark.heavy
def test_balanced_step_matches_single_device(mesh):
    scene = dam_break_2d(n_target=1200)
    g = dataclasses.replace(scene.bgrid, symmetric_fold=False)
    b0 = scene.binned_state()

    counts = np.asarray(jax.device_get(balance.cell_counts(g, b0)))
    c_cap = max(3 * g.num_cells // N_DEV, nb.halo_cells(g) + 1)
    starts = balance.balanced_splits(counts, N_DEV, c_cap)
    assert balance.balance_factor(counts, starts) < 1.7

    init_fn, step_fn, finish_fn = balance.make_balanced_step(
        mesh, scene.params, g, c_cap
    )
    bs = init_fn(b0, starts)
    n_steps = 5
    for _ in range(n_steps):
        bs = step_fn(bs)
    b_bal = finish_fn(bs, b0)

    b_ref = b0
    for _ in range(n_steps):
        b_ref = wcsph_binned.step(scene.params, g, b_ref)

    v = np.asarray(b0.valid)
    p_bal = np.asarray(b_bal.pos)[v]
    p_ref = np.asarray(b_ref.pos)[v]
    np.testing.assert_allclose(p_bal, p_ref, atol=5e-6)


def test_rebalance_threshold(mesh):
    scene = dam_break_2d(n_target=800)
    g = scene.bgrid
    b = scene.binned_state()
    c_cap = 2 * g.num_cells // N_DEV
    starts, bf, changed = balance.rebalance_splits(g, b, N_DEV, c_cap)
    assert changed and bf < 2.2
    # immediately after, the same splits are kept
    starts2, bf2, changed2 = balance.rebalance_splits(
        g, b, N_DEV, c_cap, current=starts
    )
    assert not changed2 and (starts2 == starts).all()


def test_distribute_collect_roundtrip():
    scene = dam_break_2d(n_target=500)
    g = scene.bgrid
    b = scene.binned_state()
    counts = np.asarray(jax.device_get(balance.cell_counts(g, b)))
    c_cap = 2 * g.num_cells // N_DEV
    starts = balance.balanced_splits(counts, N_DEV, c_cap)
    stacked = balance.distribute(g, b.pos, starts, c_cap)
    back = balance.collect(g, stacked, starts)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(b.pos))


def test_16m_memory_budget():
    """BASELINE config #5 feasibility: 16M particles on a v5e-8."""
    budget = balance.hbm_budget_bytes(16_000_000)
    assert budget["fits"], budget
    # and the per-device share is comfortably under half of HBM
    assert budget["per_device_gb"] < 8.0, budget


@pytest.mark.heavy
def test_balanced_periodic_3d_matches_single_device(mesh):
    """The r05 dryrun leg's mechanism at test scale: balanced particle
    splits + ppermute halos + a periodic y axis composed in ONE run, 3
    executed steps, owner-order parity vs the single-device periodic
    engine (reference: solvers/wcsph_binned.py step's wrap_ghosts +
    wall-axis masking)."""
    from sph_pie_tpu.scenes import dam_break_3d_periodic

    scene = dam_break_3d_periodic(20_000)
    g = dataclasses.replace(scene.bgrid, symmetric_fold=False)
    b0 = nb.bin_state(g, scene.state)

    counts = np.asarray(jax.device_get(balance.cell_counts(g, b0)))
    c_cap = max(3 * g.num_cells // N_DEV, nb.halo_cells(g) + 1)
    starts = balance.balanced_splits(counts, N_DEV, c_cap)
    bf = balance.balance_factor(counts, starts)
    assert bf < 1.7, bf

    init_fn, step_fn, finish_fn = balance.make_balanced_step(
        mesh, scene.params, g, c_cap
    )
    bs = init_fn(b0, starts)
    for _ in range(3):
        bs = step_fn(bs)
    b_bal = finish_fn(bs, b0)

    b_ref = b0
    for _ in range(3):
        b_ref = wcsph_binned.step(scene.params, g, b_ref)

    # owner order: ghost slots hold image copies, slot layout holds the
    # authoritative interior rows that slot_of points at
    s_bal = nb.unbin(g, b_bal, scene.state.capacity)
    s_ref = nb.unbin(g, b_ref, scene.state.capacity)
    a = np.asarray(s_ref.active)
    assert a.sum() == int(scene.state.n_active())
    np.testing.assert_allclose(
        np.asarray(s_bal.pos)[a], np.asarray(s_ref.pos)[a], atol=5e-6
    )
    # the periodic seam actually carried interactions: some particles sit
    # within h of both y edges
    p = np.asarray(s_ref.pos)[a]
    ly = g.dims[1] * g.cell_size
    h = g.cell_size - g.skin
    assert (p[:, 1] < h).any() and (p[:, 1] > ly - h).any()
