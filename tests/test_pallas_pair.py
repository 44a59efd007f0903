"""Fused Pallas pair kernels (density + forces) vs the XLA fold.

Interpret mode on CPU; the hardware path is exercised by
scripts/micro_pallas_density.py and the production bench on the real chip.
"""

import numpy as np
import pytest


def _scene(make):
    from sph_pie_tpu.scenes import builders
    from sph_pie_tpu.solvers import wcsph_binned

    # pallas_pair kernels are cap-32-only (the production sym kernels are
    # cap-general); pin the pre-skin-0.40 geometry for the 3D scene
    kw = {} if make == "dam_break_2d" else {"skin_frac": 0.25}
    scene = getattr(builders, make)(
        n_target=700 if make == "dam_break_2d" else 1500, **kw
    )
    g = scene.bgrid
    assert g.cap == 32, "pallas_pair kernels require cap-32 grids"
    b = scene.binned_state()
    b = wcsph_binned.simulate(scene.params, g, b, 10)
    return scene, g, b


@pytest.mark.heavy
@pytest.mark.parametrize("make", ["dam_break_2d", "dam_break_3d"])
def test_density_kernel_matches_fold(make):
    from sph_pie_tpu.neighbors import pallas_pair
    from sph_pie_tpu.solvers import wcsph_binned

    scene, g, b = _scene(make)
    rho_ref = np.asarray(wcsph_binned._density(scene.params, g, b))
    rho_pal = np.asarray(
        pallas_pair.density_pallas(scene.params, g, b, interpret=True)
    )
    valid = np.asarray(b.valid)
    np.testing.assert_allclose(rho_pal[valid], rho_ref[valid], rtol=3e-6)


@pytest.mark.heavy
@pytest.mark.parametrize("make", ["dam_break_2d", "dam_break_3d"])
def test_forces_kernel_matches_fold(make):
    from sph_pie_tpu.kernels import eos
    from sph_pie_tpu.neighbors import pallas_pair
    from sph_pie_tpu.solvers import wcsph_binned
    from sph_pie_tpu.utils.struct import replace

    scene, g, b = _scene(make)
    rho = wcsph_binned._density(scene.params, g, b)
    b = replace(b, density=rho, pressure=eos.tait_pressure(scene.params, rho))

    acc_ref, xs_ref = wcsph_binned._forces(scene.params, g, b)
    acc_pal, xs_pal = pallas_pair.forces_pallas(
        scene.params, g, b, interpret=True
    )
    valid = np.asarray(b.valid)
    scale = float(np.abs(np.asarray(acc_ref)[valid]).max())
    np.testing.assert_allclose(
        np.asarray(acc_pal)[valid] / scale,
        np.asarray(acc_ref)[valid] / scale,
        atol=2e-5,
    )
    if bool(scene.params.use_xsph):
        xscale = max(1e-30, float(np.abs(np.asarray(xs_ref)[valid]).max()))
        np.testing.assert_allclose(
            np.asarray(xs_pal)[valid] / xscale,
            np.asarray(xs_ref)[valid] / xscale,
            atol=2e-5,
        )
