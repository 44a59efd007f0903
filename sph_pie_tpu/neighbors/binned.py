"""Binned dense cell layout — the gather-free TPU hot path.

Why this exists (measured on a real v5e chip, see BENCH notes): XLA/TPU
executes per-particle random gathers at ~1e8 rows/s — a naive gather-based
cell-list SPH step at 100k particles costs seconds. The VPU, by contrast,
does dense elementwise math at TFLOP/s. So the TPU-native layout makes the
neighbor structure *dense and static*:

  * Every grid cell owns ``cap`` particle slots in one flat slot-major array
    (slot = cell_id * cap + rank). A one-cell ghost border keeps every
    neighbor window in-bounds, so interior windows never wrap.
  * Cells are raveled row-major with the LAST spatial axis contiguous, so
    the three x-adjacent cells of any cell are contiguous slots. The 3^d
    neighbor stencil collapses to 3^(d-1) "slabs": for each combination of
    offsets along the leading axes, the neighbor block is a single
    **static slice** of the flat array (shifted by a compile-time constant)
    — zero gathers, pure VPU streaming.
  * A Verlet-style skin (cell_size = h + skin) lets the expensive re-binning
    (counting sort) run only when accumulated displacement can have exceeded
    skin/2, instead of every step.

The layout trades FLOPs on empty slots for the elimination of gathers —
the right trade on TPU by ~3 orders of magnitude.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Callable, TypeVar

import jax
import jax.numpy as jnp

from sph_pie_tpu.core.state import ParticleState, allocate
from sph_pie_tpu.utils.struct import pytree_dataclass, replace

Carry = TypeVar("Carry")


@dataclasses.dataclass(frozen=True)
class BinnedGrid:
    """Static slot-grid description (part of the jit cache key)."""

    dims: tuple[int, ...]      # interior cells per axis
    origin: tuple[float, ...]  # world coordinate of interior cell (0,..,0)
    cell_size: float           # >= support radius h + skin
    cap: int                   # particle slots per cell
    skin: float                # Verlet skin absorbed into cell_size

    @property
    def dim(self) -> int:
        return len(self.dims)

    @property
    def padded_dims(self) -> tuple[int, ...]:
        return tuple(d + 2 for d in self.dims)  # one ghost cell per side

    @property
    def num_cells(self) -> int:
        return math.prod(self.padded_dims)

    @property
    def num_slots(self) -> int:
        return self.num_cells * self.cap

    @property
    def strides(self) -> tuple[int, ...]:
        pd = self.padded_dims
        s = [1] * self.dim
        for a in range(self.dim - 2, -1, -1):
            s[a] = s[a + 1] * pd[a + 1]
        return tuple(s)

    def slab_shifts(self) -> list[int]:
        """Flat cell shifts for each {-1,0,1}^(dim-1) leading-axes offset."""
        shifts = [0]
        for a in range(self.dim - 1):
            stride = self.strides[a]
            shifts = [s + o * stride for s in shifts for o in (-1, 0, 1)]
        return shifts


def binned_grid_from_bounds(
    bound_min, bound_max, h: float, cap: int, skin_frac: float = 0.5
) -> BinnedGrid:
    """Grid whose cells are h*(1+skin_frac) wide; rebin is needed only when
    a particle may have moved more than skin/2 since the last binning."""
    skin = float(skin_frac) * float(h)
    cell = float(h) + skin
    bmin = tuple(float(v) for v in bound_min)
    bmax = tuple(float(v) for v in bound_max)
    dims = tuple(
        max(1, int(math.ceil((hi - lo) / cell))) for lo, hi in zip(bmin, bmax)
    )
    return BinnedGrid(dims=dims, origin=bmin, cell_size=cell, cap=int(cap), skin=skin)


@pytree_dataclass
class BinnedState:
    """Dense slot-major particle state. Leading dim = grid.num_slots."""

    pos: jax.Array       # [S, dim]
    vel: jax.Array       # [S, dim]
    mass: jax.Array      # [S]
    density: jax.Array   # [S]
    pressure: jax.Array  # [S]
    valid: jax.Array     # [S] bool
    owner: jax.Array     # [S] int32 — original particle index, -1 if empty
    travel: jax.Array    # [] upper bound on per-particle displacement since bin
    overflow: jax.Array  # [] int32 — particles dropped because a cell overflowed


def _cell_ids(grid: BinnedGrid, pos, valid):
    """Padded-grid flat cell id per row; invalid rows -> sentinel past end."""
    origin = jnp.asarray(grid.origin, pos.dtype)
    rel = (pos - origin) / grid.cell_size
    coords = jnp.floor(rel).astype(jnp.int32) + 1  # +1: ghost border offset
    pd = jnp.asarray(grid.padded_dims, jnp.int32)
    coords = jnp.clip(coords, 1, pd - 2)  # interior only; border stays empty
    cid = jnp.sum(coords * jnp.asarray(grid.strides, jnp.int32), axis=-1)
    return jnp.where(valid, cid, jnp.int32(grid.num_cells))


def _bin_rows(grid: BinnedGrid, pos, vel, mass, owner, valid) -> BinnedState:
    """Counting-sort arbitrary rows into the dense slot layout."""
    n = pos.shape[0]
    cid = _cell_ids(grid, pos, valid)
    order = jnp.argsort(cid).astype(jnp.int32)
    sorted_cid = cid[order]
    # rank within cell = position in sort - first position of this cell
    first = jnp.searchsorted(sorted_cid, sorted_cid, side="left")
    rank = jnp.arange(n, dtype=jnp.int32) - first.astype(jnp.int32)
    fits = (rank < grid.cap) & (sorted_cid < grid.num_cells)
    # NOTE: scatter mode="drop" WRAPS negative indices (verified on this
    # jax version), so the drop sentinel must be past-the-end, not -1.
    slot = jnp.where(fits, sorted_cid * grid.cap + rank, grid.num_slots)

    S = grid.num_slots
    dt = pos.dtype

    def scat(init, rows):
        return init.at[slot].set(rows, mode="drop")

    out = BinnedState(
        pos=scat(jnp.zeros((S, grid.dim), dt), pos[order]),
        vel=scat(jnp.zeros((S, grid.dim), dt), vel[order]),
        mass=scat(jnp.zeros((S,), dt), mass[order]),
        density=jnp.zeros((S,), dt),
        pressure=jnp.zeros((S,), dt),
        valid=scat(jnp.zeros((S,), jnp.bool_), fits),
        owner=jnp.full((S,), -1, jnp.int32).at[slot].set(
            owner[order], mode="drop"
        ),
        travel=jnp.zeros((), dt),
        overflow=jnp.sum(
            (cid < grid.num_cells).astype(jnp.int32)
        ) - jnp.sum(fits.astype(jnp.int32)),
    )
    return out


def bin_state(grid: BinnedGrid, state: ParticleState) -> BinnedState:
    """ParticleState (flat, original order) -> dense binned layout."""
    owner = jnp.arange(state.capacity, dtype=jnp.int32)
    return _bin_rows(grid, state.pos, state.vel, state.mass, owner, state.active)


def rebin(grid: BinnedGrid, b: BinnedState) -> BinnedState:
    """Re-sort the dense layout after particles have drifted."""
    return _bin_rows(grid, b.pos, b.vel, b.mass, b.owner, b.valid)


def unbin(grid: BinnedGrid, b: BinnedState, capacity: int) -> ParticleState:
    """Dense layout -> flat original-order ParticleState."""
    st = allocate(capacity, grid.dim, b.pos.dtype)
    # Empty slots carry owner == -1, which scatter mode="drop" would WRAP
    # to the last row — remap them to an out-of-bounds sentinel instead.
    ow = jnp.where(b.valid, b.owner, jnp.int32(capacity))
    return replace(
        st,
        pos=st.pos.at[ow].set(b.pos, mode="drop"),
        vel=st.vel.at[ow].set(b.vel, mode="drop"),
        mass=st.mass.at[ow].set(b.mass, mode="drop"),
        density=st.density.at[ow].set(b.density, mode="drop"),
        pressure=st.pressure.at[ow].set(b.pressure, mode="drop"),
        active=st.active.at[ow].set(b.valid, mode="drop"),
    )


def slab_windows(grid: BinnedGrid, x: jax.Array) -> list[jax.Array]:
    """For each of the 3^(dim-1) slabs, the [S, 3*cap, ...] neighbor window.

    ``x`` is a flat slot-major array [S, ...]. The window for slab ``s`` at
    cell c covers cells (c + shift_s - 1, c + shift_s, c + shift_s + 1) —
    contiguous because the last spatial axis has stride 1. Implemented as
    three compile-time-constant slices of a zero-padded copy; reshaped to
    [num_cells, 3*cap, ...].

    Returns a list (static length) of [num_cells, 3*cap, ...] arrays.
    """
    cap = grid.cap
    S = grid.num_slots
    shifts = grid.slab_shifts()
    pad = (max(abs(s) for s in shifts) + 1) * cap
    pad_width = [(pad, pad)] + [(0, 0)] * (x.ndim - 1)
    xp = jnp.pad(x, pad_width)
    tail = x.shape[1:]
    out = []
    for sh in shifts:
        base = pad + sh * cap
        parts = [
            xp[base - cap : base - cap + S],
            xp[base : base + S],
            xp[base + cap : base + cap + S],
        ]
        blocks = [p.reshape((grid.num_cells, cap) + tail) for p in parts]
        out.append(jnp.concatenate(blocks, axis=1))
    return out


def slab_fold(
    grid: BinnedGrid,
    fields: dict[str, jax.Array],
    pair_fn: Callable[[Carry, dict[str, jax.Array]], Carry],
    init: Carry,
) -> Carry:
    """Fold ``pair_fn`` over the 3^(dim-1) neighbor slabs.

    ``fields`` maps name -> flat [S, ...] array. For each slab, ``pair_fn``
    receives a dict of [num_cells, 3*cap, ...] neighbor windows and must
    return an updated carry (typically [num_cells, cap, ...] accumulators
    over the home block, which the caller reshapes from the same flat
    arrays). The Python loop is static (3 slabs in 2D, 9 in 3D) and unrolls
    under jit — all slices have compile-time constants, zero gathers.
    """
    windows = {k: slab_windows(grid, v) for k, v in fields.items()}
    n_slabs = len(next(iter(windows.values())))
    carry = init
    for s in range(n_slabs):
        carry = pair_fn(carry, {k: w[s] for k, w in windows.items()})
    return carry


def cell_view(grid: BinnedGrid, x: jax.Array) -> jax.Array:
    """Flat [S, ...] -> per-cell [num_cells, cap, ...] view of home slots."""
    return x.reshape((grid.num_cells, grid.cap) + x.shape[1:])


def flat_view(grid: BinnedGrid, x: jax.Array) -> jax.Array:
    """Inverse of cell_view."""
    return x.reshape((grid.num_slots,) + x.shape[2:])
