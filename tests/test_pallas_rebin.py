"""Pallas rebin expansion kernel vs the XLA scatter path (interpret mode)."""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl


@pytest.fixture
def interpret_pallas(monkeypatch):
    monkeypatch.setattr(pl, "pallas_call", partial(pl.pallas_call, interpret=True))


def test_expand_matches_reference(interpret_pallas):
    from sph_pie_tpu.neighbors import pallas_rebin

    rng = np.random.default_rng(7)
    num_cells, cap, ncol = 900, 16, 8
    counts = rng.integers(0, cap + 1, num_cells).astype(np.int32)
    # a few overflowing cells, bounded so each 256-cell block drops fewer
    # than SLACK*cap rows (the kernel's exactness envelope; beyond it the
    # tail cells degrade to clean drops)
    overflow_cells = rng.choice(num_cells, 6, replace=False)
    counts[overflow_cells] = cap + rng.integers(1, 8, 6)
    first = np.concatenate([[0], np.cumsum(counts)])[:-1].astype(np.int32)
    K = int(counts.sum())
    rows = rng.normal(size=(K, ncol)).astype(np.float32)

    dense = np.asarray(
        pallas_rebin.expand(
            jnp.asarray(first), jnp.asarray(counts), jnp.asarray(rows), cap
        )
    ).reshape(num_cells, cap, ncol)

    ref = np.zeros_like(dense)
    for c in range(num_cells):
        n = min(int(counts[c]), cap)
        ref[c, :n] = rows[first[c] : first[c] + n]
    np.testing.assert_array_equal(dense, ref)


def test_bin_rows_pallas_path_equals_scatter_path(interpret_pallas, monkeypatch):
    """Force the pallas branch of _bin_rows (interpret) and compare every
    dense output against the scatter branch."""
    import sph_pie_tpu.neighbors.binned as nb
    from sph_pie_tpu.scenes import dam_break_2d

    scene = dam_break_2d(n_target=300)
    g = scene.bgrid
    st = scene.state

    monkeypatch.setattr(nb, "_PALLAS_EXPAND", False)
    b_scatter = nb.bin_state(g, st, scene.boundary)
    monkeypatch.setattr(nb, "_PALLAS_EXPAND", True)
    b_pallas = nb.bin_state(g, st, scene.boundary)
    monkeypatch.setattr(nb, "_PALLAS_EXPAND", None)

    for name in ("pos", "vel", "mass", "valid", "owner", "slot_of", "bin_pos"):
        np.testing.assert_array_equal(
            np.asarray(getattr(b_scatter, name)),
            np.asarray(getattr(b_pallas, name)),
            err_msg=name,
        )
    assert int(b_pallas.overflow) == int(b_scatter.overflow)


def test_rebin_density_carry_pallas_equals_scatter(interpret_pallas, monkeypatch):
    """The PBF ride scheme's rebin (carry_density=True) through the pallas
    expand path: round 4 extended the kernel to ride the density column
    (it previously predated density and was skipped exactly on the
    flagship PBF path)."""
    import sph_pie_tpu.neighbors.binned as nb
    from sph_pie_tpu.scenes import dam_break_2d
    from sph_pie_tpu.solvers import pbf

    scene = dam_break_2d(n_target=300)
    g = scene.bgrid
    b = scene.binned_state()
    b = pbf.simulate(scene.params, g, pbf.flagship_params(), b, 3)

    monkeypatch.setattr(nb, "_PALLAS_EXPAND", False)
    a = nb.rebin(g, b, carry_density=True)
    monkeypatch.setattr(nb, "_PALLAS_EXPAND", True)
    c = nb.rebin(g, b, carry_density=True)
    monkeypatch.setattr(nb, "_PALLAS_EXPAND", None)

    for name in ("pos", "vel", "mass", "density", "valid", "owner",
                 "slot_of", "bin_pos"):
        np.testing.assert_array_equal(
            np.asarray(getattr(a, name)),
            np.asarray(getattr(c, name)),
            err_msg=name,
        )
    assert int(a.overflow) == int(c.overflow)
