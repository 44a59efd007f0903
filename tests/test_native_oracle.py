"""Native C++ oracle vs the NumPy oracle (and build machinery)."""

import numpy as np
import pytest

from sph_pie_tpu import native
from sph_pie_tpu.oracle import oracle_from_scene
from sph_pie_tpu.scenes import builders

pytestmark = pytest.mark.skipif(
    not native.available(), reason=f"no native toolchain: {native.build_error()}"
)


def test_native_matches_numpy_oracle_2d():
    scene = builders.dam_break_2d(n_target=200)
    py = oracle_from_scene(scene, dtype=np.float64)
    pos, vel = native.oracle_run(scene.params, py.pos, py.vel, py.mass, 80)
    want = py.run(80)
    assert np.abs(pos - want).max() < 1e-9


def test_native_matches_numpy_oracle_3d_with_terms():
    scene = builders.dam_break_3d(n_target=600)  # xsph + cohesion active
    py = oracle_from_scene(scene, dtype=np.float64)
    pos, vel = native.oracle_run(scene.params, py.pos, py.vel, py.mass, 40)
    want = py.run(40)
    assert np.abs(pos - want).max() < 1e-9


def test_native_speed_sanity():
    """The point of the native oracle: contract-scale throughput."""
    import time

    scene = builders.dam_break_2d(n_target=2048)
    py = oracle_from_scene(scene, dtype=np.float64)
    t0 = time.time()
    native.oracle_run(scene.params, py.pos, py.vel, py.mass, 20)
    per_step = (time.time() - t0) / 20
    # generous bound; NumPy needs ~10x this at 2k particles
    assert per_step < 0.5, f"native oracle too slow: {per_step:.3f}s/step"
