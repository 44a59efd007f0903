"""Cell-list neighbor search vs brute force (SURVEY.md §7.3 unit archetype)."""

import jax.numpy as jnp
import numpy as np

from sph_pie_tpu.neighbors import grid as nbr


def _candidate_matrix(gspec, pos, active):
    """Dense [N, N] bool matrix of candidate pairs produced by the fold."""
    n = pos.shape[0]
    cl = nbr.build(gspec, pos, active)
    rows = jnp.arange(n)[:, None]

    def pair(mat, j, valid):
        return mat.at[rows, j].max(valid)

    return np.asarray(nbr.neighbor_fold(gspec, cl, pair, jnp.zeros((n, n), bool)))


def test_all_true_neighbors_found_2d():
    rng = np.random.default_rng(0)
    n, h = 256, 0.12
    pos = jnp.asarray(rng.uniform(0, 1, (n, 2)), jnp.float32)
    gspec = nbr.grid_from_bounds([0, 0], [1, 1], cell_size=h, cap=64)
    cand = _candidate_matrix(gspec, pos, jnp.ones((n,), bool))
    d = np.asarray(pos)[:, None, :] - np.asarray(pos)[None, :, :]
    true_nbrs = (d**2).sum(-1) < h * h
    missed = true_nbrs & ~cand
    assert not missed.any(), f"{missed.sum()} true neighbor pairs missed"


def test_all_true_neighbors_found_3d():
    rng = np.random.default_rng(1)
    n, h = 200, 0.2
    pos = jnp.asarray(rng.uniform(0, 1, (n, 3)), jnp.float32)
    gspec = nbr.grid_from_bounds([0, 0, 0], [1, 1, 1], cell_size=h, cap=64)
    cand = _candidate_matrix(gspec, pos, jnp.ones((n,), bool))
    d = np.asarray(pos)[:, None, :] - np.asarray(pos)[None, :, :]
    true_nbrs = (d**2).sum(-1) < h * h
    assert not (true_nbrs & ~cand).any()


def test_inactive_particles_never_candidates():
    rng = np.random.default_rng(2)
    n, h = 128, 0.15
    pos = jnp.asarray(rng.uniform(0, 1, (n, 2)), jnp.float32)
    active = jnp.asarray(rng.uniform(size=n) < 0.5)
    gspec = nbr.grid_from_bounds([0, 0], [1, 1], cell_size=h, cap=64)
    cand = _candidate_matrix(gspec, pos, active)
    inactive_cols = cand[:, ~np.asarray(active)]
    assert not inactive_cols.any()


def test_out_of_bounds_positions_clip_safely():
    pos = jnp.asarray([[-5.0, 0.5], [0.5, 0.5], [7.0, 7.0]], jnp.float32)
    gspec = nbr.grid_from_bounds([0, 0], [1, 1], cell_size=0.25, cap=8)
    cl = nbr.build(gspec, pos, jnp.ones((3,), bool))
    assert int(nbr.max_cell_occupancy(gspec, cl)) <= 3  # no crash, sane counts


def test_occupancy_diagnostic():
    pos = jnp.asarray([[0.1, 0.1]] * 5 + [[0.9, 0.9]], jnp.float32)
    gspec = nbr.grid_from_bounds([0, 0], [1, 1], cell_size=0.5, cap=8)
    cl = nbr.build(gspec, pos, jnp.ones((6,), bool))
    assert int(nbr.max_cell_occupancy(gspec, cl)) == 5
