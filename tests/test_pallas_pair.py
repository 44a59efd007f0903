"""Fused Pallas density kernel vs the XLA fold (interpret mode)."""

from functools import partial

import numpy as np
import pytest
from jax.experimental import pallas as pl


@pytest.fixture
def interpret_pallas(monkeypatch):
    monkeypatch.setattr(pl, "pallas_call", partial(pl.pallas_call, interpret=True))


@pytest.mark.parametrize("make", ["dam_break_2d", "dam_break_3d"])
def test_density_kernel_matches_fold(interpret_pallas, make):
    from sph_pie_tpu.neighbors import pallas_pair
    from sph_pie_tpu.scenes import builders
    from sph_pie_tpu.solvers import wcsph_binned

    scene = getattr(builders, make)(
        n_target=700 if make == "dam_break_2d" else 1500
    )
    g = scene.bgrid
    assert g.cap == 32, "scene builders produce cap-32 grids"
    b = scene.binned_state()
    b = wcsph_binned.simulate(scene.params, g, b, 10)

    rho_ref = np.asarray(wcsph_binned._density(scene.params, g, b))
    rho_pal = np.asarray(pallas_pair.density_pallas(scene.params, g, b))
    valid = np.asarray(b.valid)
    np.testing.assert_allclose(rho_pal[valid], rho_ref[valid], rtol=3e-6)
