"""HBM budget accounting for BASELINE config #5 (16M on v5e-8)."""

import numpy as np

from sph_pie_tpu.utils.membudget import budget, dam_break_budget


def test_16m_fits_v5e_pod_but_not_one_chip():
    b8 = dam_break_budget(16_000_000, n_devices=8)
    assert b8.fits, b8.row()
    # sanity: the dominant term is the dense slot state and it is
    # per-device sharded
    assert b8.dense_state_bytes * 8 >= b8.num_slots * 40
    b1 = dam_break_budget(16_000_000, n_devices=1)
    assert not b1.fits, b1.row()


def test_budget_matches_shape_math_at_small_n():
    """The analytical budget uses the SAME static grid the engine builds."""
    from sph_pie_tpu.scenes import dam_break_3d

    scene = dam_break_3d(n_target=50_000)
    b = budget(scene.bgrid, 50_000)
    assert b.num_slots == scene.bgrid.num_slots
    assert b.fits


def test_shape_only_scene_matches_built_capacity():
    from sph_pie_tpu.scenes import dam_break_3d

    a = dam_break_3d(n_target=30_000)
    b = dam_break_3d(n_target=30_000, build_state=False)
    assert a.state.capacity == b.state.capacity
    assert a.bgrid == b.bgrid
