"""Symmetric Pallas pair kernels (pairs once) vs the XLA fold.

Interpret mode on CPU; hardware timing rides scripts/micro_pallas_sym.py.
"""

import numpy as np
import pytest


def _scene(make):
    from sph_pie_tpu.scenes import builders
    from sph_pie_tpu.solvers import wcsph_binned

    scene = getattr(builders, make)(
        n_target=700 if make == "dam_break_2d" else 1500
    )
    g = scene.bgrid
    # dam_break_2d -> cap 32 (4 cells/row exact); dam_break_3d -> cap 40
    # (3 cells/row + filler lanes) — both packings must match the fold
    assert g.cap == (32 if make == "dam_break_2d" else 40)
    b = scene.binned_state()
    b = wcsph_binned.simulate(scene.params, g, b, 10)
    return scene, g, b


@pytest.mark.heavy  # interpret-mode Mosaic compiles are minutes on the
# 1-CPU mesh; the production route is also hardware-verified every round
# (scripts/micro_sym40.py rel err + the flagship bench)
@pytest.mark.parametrize("make", ["dam_break_2d", "dam_break_3d"])
def test_density_sym_matches_fold(make):
    from sph_pie_tpu.neighbors import pallas_sym
    from sph_pie_tpu.solvers import wcsph_binned

    scene, g, b = _scene(make)
    rho_ref = np.asarray(wcsph_binned._density(scene.params, g, b))
    rho_pal = np.asarray(
        pallas_sym.density_sym(scene.params, g, b, interpret=True)
    )
    valid = np.asarray(b.valid)
    np.testing.assert_allclose(rho_pal[valid], rho_ref[valid], rtol=3e-6)


# (A forces_sym parity test lived here through round 4; the forces kernel
# measured 0.59x the fold at the shipped geometry and was trimmed —
# ROADMAP ledger item 18.)


# ---- default-tier guards (no Mosaic compile) ---------------------------
# Full kernel parity lives in the heavy tier above (interpret-mode compile
# is minutes on the 1-CPU mesh) and on hardware via scripts/micro_sym40.py
# every round; these cover the cap-general packing/index math that round 3
# rewrote, in milliseconds (ADVICE r03).


def test_plan_sym_rejects_two_cell_rows():
    """caps 48-64 pack only 2 cells/128-lane row, but a positive-shift
    slab's window spans 3 cells (c+sh-1..c+sh+1) — pairs in c+sh+1 would
    silently drop. _plan_sym must refuse (ADVICE r03 medium)."""
    import jax.numpy as jnp
    import pytest as _pytest

    from sph_pie_tpu.neighbors import binned as nb
    from sph_pie_tpu.neighbors import pallas_sym

    for cap, ok in ((8, True), (24, True), (32, True), (40, True),
                    (48, False), (56, False), (64, False), (36, False)):
        g = nb.BinnedGrid(
            dims=(8, 8), origin=(0.0, 0.0), cell_size=0.1, cap=cap,
            skin=0.025,
        )
        if ok:
            pallas_sym._plan_sym(g)
        else:
            with _pytest.raises(ValueError):
                pallas_sym._plan_sym(g)


def test_pack_rows_layout_cap40():
    """_pack_rows at cap 40 (3 cells/row + 8 filler lanes): every slot
    value lands at row (padc+cell)//3, lane ((padc+cell)%3)*40 + slot;
    filler lanes are exactly zero; round-trip through the _combine
    flattening recovers the input."""
    import jax.numpy as jnp
    import numpy as np

    from sph_pie_tpu.neighbors import binned as nb
    from sph_pie_tpu.neighbors import pallas_sym
    from sph_pie_tpu.neighbors.pallas_pair import _pack_rows

    g = nb.BinnedGrid(
        dims=(4, 4, 4), origin=(0.0, 0.0, 0.0), cell_size=0.1, cap=40,
        skin=0.025,
    )
    plan = pallas_sym._plan_sym(g)
    assert plan["cpr"] == 3
    S = g.num_slots
    vals = jnp.arange(1, S + 1, dtype=jnp.float32)
    packed = np.asarray(_pack_rows(g, plan, [vals]))[0]
    cap, cpr, padc = g.cap, plan["cpr"], plan["padc"]
    # filler lanes all zero
    assert (packed[:, cpr * cap:] == 0).all()
    # spot-check the documented layout for every slot
    flat = packed[:, : cpr * cap].reshape(-1)
    np.testing.assert_array_equal(
        flat[padc * cap : padc * cap + S], np.asarray(vals)
    )
    # _combine's home path is the exact inverse at offset h0
    home_rows = packed[plan["h0"] : plan["h0"] + plan["nblk"] * plan["rows_blk"]]
    win_zero = [
        jnp.zeros((plan["nblk"] * plan["nr"], 128), jnp.float32)
        for _ in plan["slabs"]
    ]
    out = np.asarray(
        pallas_sym._combine(plan, g, jnp.asarray(home_rows), win_zero)
    )
    np.testing.assert_array_equal(out, np.asarray(vals))
