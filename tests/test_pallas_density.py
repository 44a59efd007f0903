"""Pallas density kernel == XLA slab fold (interpret mode on CPU)."""

import numpy as np
import pytest

from sph_pie_tpu.neighbors import pallas_density
from sph_pie_tpu.scenes import builders
from sph_pie_tpu.solvers import wcsph_binned


@pytest.mark.parametrize("scene_fn,kw", [
    (builders.dam_break_2d, {"n_target": 400}),
    (builders.dam_break_3d, {"n_target": 1500}),
])
def test_pallas_density_matches_fold(scene_fn, kw):
    scene = scene_fn(**kw)
    b = scene.binned_state()
    want = np.asarray(wcsph_binned._density(scene.params, scene.bgrid, b))
    got = np.asarray(
        pallas_density.density_pallas(scene.params, scene.bgrid, b, interpret=True)
    )
    valid = np.asarray(b.valid)
    np.testing.assert_allclose(got[valid], want[valid], rtol=1e-5)
