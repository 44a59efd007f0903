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


@pytest.mark.heavy
@pytest.mark.parametrize("make", ["dam_break_2d",
    pytest.param("dam_break_3d", marks=pytest.mark.heavy)])
def test_forces_sym_matches_fold(make):
    from sph_pie_tpu.kernels import eos
    from sph_pie_tpu.neighbors import pallas_sym
    from sph_pie_tpu.solvers import wcsph_binned
    from sph_pie_tpu.utils.struct import replace

    scene, g, b = _scene(make)
    rho = wcsph_binned._density(scene.params, g, b)
    b = replace(b, density=rho, pressure=eos.tait_pressure(scene.params, rho))

    acc_ref, xs_ref = wcsph_binned._forces(scene.params, g, b)
    acc_pal, xs_pal = pallas_sym.forces_sym(
        scene.params, g, b, interpret=True
    )
    valid = np.asarray(b.valid)
    scale = float(np.abs(np.asarray(acc_ref)[valid]).max())
    np.testing.assert_allclose(
        np.asarray(acc_pal)[valid] / scale,
        np.asarray(acc_ref)[valid] / scale,
        atol=3e-5,
    )
    if bool(scene.params.use_xsph):
        xscale = max(1e-30, float(np.abs(np.asarray(xs_ref)[valid]).max()))
        np.testing.assert_allclose(
            np.asarray(xs_pal)[valid] / xscale,
            np.asarray(xs_ref)[valid] / xscale,
            atol=3e-5,
        )
