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
from jax import lax

from sph_pie_tpu.core.state import ParticleState, allocate
from sph_pie_tpu.utils.struct import pytree_dataclass, replace

Carry = TypeVar("Carry")


@dataclasses.dataclass(frozen=True)
class BinnedGrid:
    """Static slot-grid description (part of the jit cache key)."""

    dims: tuple[int, ...]      # interior cells per GRID axis
    origin: tuple[float, ...]  # world coord of interior cell (0,..,0), grid order
    cell_size: float           # >= support radius h + skin
    cap: int                   # particle slots per cell
    skin: float                # Verlet skin absorbed into cell_size
    block_cells: int = 0       # cells per fold block (0 = whole grid at once)
    max_particles: int = 0     # compact particle capacity (for O(N) rebin)
    axis_order: tuple[int, ...] = ()  # grid axis g -> spatial axis. Putting
                               # the gravity axis first makes settled fluid a
                               # contiguous prefix of cell ids, so trailing
                               # blocks are empty and the fold skips them.
    skip_empty_blocks: bool = True

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
    bound_min,
    bound_max,
    h: float,
    cap: int,
    skin_frac: float = 0.5,
    block_cells: int | None = None,
    max_particles: int = 0,
    axis_order: tuple[int, ...] | None = None,
) -> BinnedGrid:
    """Grid whose cells are h*(1+skin_frac) wide; rebin is needed only when
    a particle may have moved more than skin/2 since the last binning.

    ``block_cells`` bounds the pair-interaction temporaries to
    [block_cells, cap, 3cap] (the fold scans over blocks); auto-sized so a
    block's pair tensor stays ~8M elements (~32 MB f32) unless given.
    """
    skin = float(skin_frac) * float(h)
    cell = float(h) + skin
    bmin = tuple(float(v) for v in bound_min)
    bmax = tuple(float(v) for v in bound_max)
    dim = len(bmin)
    if axis_order is None:
        axis_order = tuple(range(dim))
    dims = tuple(
        max(1, int(math.ceil((bmax[a] - bmin[a]) / cell))) for a in axis_order
    )
    grid = BinnedGrid(
        dims=dims,
        origin=tuple(bmin[a] for a in axis_order),
        cell_size=cell,
        cap=int(cap),
        skin=skin,
        max_particles=int(max_particles),
        axis_order=tuple(axis_order),
    )
    if block_cells is None:
        # Small blocks win twice in 3D: finer empty-block skip granularity
        # and smaller VMEM-resident temps. Sweeps on v5e (dam breaks):
        # 3D wants 256 cells/block (1M: 154 vs 298 ms/step at the old
        # pair-budget choice of 2730); 2D grids are small and lightly
        # skippable, so larger blocks (1024) edge out on dispatch overhead.
        budget = 8 * 1024 * 1024  # pair-tensor element cap per block
        sweet = 1024 if len(dims) == 2 else 256
        block_cells = max(8, min(sweet, budget // (grid.cap * 3 * grid.cap)))
        if block_cells >= grid.num_cells:
            block_cells = 0  # single block — no scan needed
    return dataclasses.replace(grid, block_cells=int(block_cells))


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
    slot_of: jax.Array   # [K] int32 — particle k's slot; num_slots if absent.
                         # Keeps rebin/unbin O(K): compact-gather K rows, sort
                         # K keys, scatter K rows (never O(S) scatters).
    bin_pos: jax.Array   # [S, dim] positions AT BIN TIME: the anchor for the
                         # true-displacement rebin trigger (the accumulated
                         # sum-of-max-speeds bound alone over-triggers ~2-4x
                         # in oscillatory late-stage flow)
    travel: jax.Array    # [] upper bound on per-particle displacement since bin
    overflow: jax.Array  # [] int32 — particles dropped because a cell overflowed


def _cell_ids(grid: BinnedGrid, pos, valid):
    """Padded-grid flat cell id per row; invalid rows -> sentinel past end."""
    order = grid.axis_order or tuple(range(grid.dim))
    pos_g = pos[:, list(order)]  # spatial columns permuted into grid order
    origin = jnp.asarray(grid.origin, pos.dtype)
    rel = (pos_g - origin) / grid.cell_size
    coords = jnp.floor(rel).astype(jnp.int32) + 1  # +1: ghost border offset
    pd = jnp.asarray(grid.padded_dims, jnp.int32)
    coords = jnp.clip(coords, 1, pd - 2)  # interior only; border stays empty
    cid = jnp.sum(coords * jnp.asarray(grid.strides, jnp.int32), axis=-1)
    return jnp.where(valid, cid, jnp.int32(grid.num_cells))


def _bin_rows(grid: BinnedGrid, pos, vel, mass, owner, valid) -> BinnedState:
    """Counting-sort K compact rows into the dense slot layout. O(K log K).

    ``owner`` must be the particle index of each row (rows are the compact
    particle arrays), so K == grid.max_particles.

    TPU cost notes (measured v5e, 1M rows): a single multi-operand
    ``lax.sort`` that carries every payload column with the key costs
    ~22 ms — the round-1 argsort + per-field gathers cost ~260 ms, and its
    ``searchsorted`` rank another ~170 ms (replaced here by a cummax scan
    over change-points, ~5 ms). The remaining cost is the dense scatters.
    """
    n = pos.shape[0]
    dim = grid.dim
    cid = _cell_ids(grid, pos, valid)

    # One sort, all payloads riding with the key.
    ops = (
        (cid,)
        + tuple(pos[:, k] for k in range(dim))
        + tuple(vel[:, k] for k in range(dim))
        + (mass, owner)
    )
    sorted_ops = jax.lax.sort(ops, num_keys=1)
    scid = sorted_ops[0]
    spos = sorted_ops[1 : 1 + dim]
    svel = sorted_ops[1 + dim : 1 + 2 * dim]
    smass = sorted_ops[1 + 2 * dim]
    sowner = sorted_ops[2 + 2 * dim]

    # rank within cell = i - (index of this cell's first row), where the
    # first-row index is the running max over change-point markers.
    iota = jnp.arange(n, dtype=jnp.int32)
    is_start = jnp.concatenate(
        [jnp.ones((1,), jnp.bool_), scid[1:] != scid[:-1]]
    )
    first = jax.lax.associative_scan(
        jnp.maximum, jnp.where(is_start, iota, 0)
    )
    rank = iota - first
    fits = (rank < grid.cap) & (scid < grid.num_cells)
    # NOTE: scatter mode="drop" WRAPS negative indices (verified on this
    # jax version), so the drop sentinel must be past-the-end, not -1.
    slot = jnp.where(fits, scid * grid.cap + rank, grid.num_slots)

    S = grid.num_slots
    dt = pos.dtype

    def scat(rows):
        return jnp.zeros((S,), rows.dtype).at[slot].set(rows, mode="drop")

    pos_d = jnp.stack([scat(c) for c in spos], axis=-1)
    mass_d = scat(smass)
    out = BinnedState(
        pos=pos_d,
        vel=jnp.stack([scat(c) for c in svel], axis=-1),
        mass=mass_d,
        density=jnp.zeros((S,), dt),
        pressure=jnp.zeros((S,), dt),
        # Real particles have strictly positive mass (lattice_mass > 0),
        # empty slots scatter to 0 — validity is derivable, no bool scatter.
        valid=mass_d > 0,
        owner=jnp.full((S,), -1, jnp.int32).at[slot].set(sowner, mode="drop"),
        slot_of=jnp.full((n,), S, jnp.int32).at[sowner].set(slot, mode="drop"),
        bin_pos=pos_d,
        travel=jnp.zeros((), dt),
        overflow=jnp.sum(
            (cid < grid.num_cells).astype(jnp.int32)
        ) - jnp.sum(fits.astype(jnp.int32)),
    )
    return out


def bin_state(grid: BinnedGrid, state: ParticleState) -> BinnedState:
    """ParticleState (flat, original order) -> dense binned layout."""
    if grid.max_particles and state.capacity != grid.max_particles:
        raise ValueError(
            f"state capacity {state.capacity} != grid.max_particles "
            f"{grid.max_particles}"
        )
    owner = jnp.arange(state.capacity, dtype=jnp.int32)
    return _bin_rows(grid, state.pos, state.vel, state.mass, owner, state.active)


def _compact(grid: BinnedGrid, b: BinnedState):
    """Gather the K compact particle rows out of the dense layout. O(K)."""
    S = grid.num_slots
    safe = jnp.clip(b.slot_of, 0, S - 1)
    alive = b.slot_of < S
    return (
        b.pos[safe],
        b.vel[safe],
        b.mass[safe],
        alive,
    )


def rebin(grid: BinnedGrid, b: BinnedState) -> BinnedState:
    """Re-sort after drift: compact-gather K rows, then re-bin. O(K log K).

    (The obvious alternative — re-binning the S dense slots directly — costs
    O(S) scatters over mostly-empty slots: measured 867 ms vs ~10 ms at 3D
    100k on v5e.)
    """
    pos, vel, mass, alive = _compact(grid, b)
    owner = jnp.arange(pos.shape[0], dtype=jnp.int32)
    return _bin_rows(grid, pos, vel, mass, owner, alive)


def unbin(grid: BinnedGrid, b: BinnedState, capacity: int) -> ParticleState:
    """Dense layout -> flat original-order ParticleState. O(K) gathers."""
    if b.slot_of.shape[0] != capacity:
        raise ValueError(
            f"capacity {capacity} != particle capacity {b.slot_of.shape[0]}"
        )
    S = grid.num_slots
    safe = jnp.clip(b.slot_of, 0, S - 1)
    alive = b.slot_of < S
    st = allocate(capacity, grid.dim, b.pos.dtype)
    zero2 = jnp.zeros((capacity, grid.dim), b.pos.dtype)
    m = alive[:, None]
    return replace(
        st,
        pos=jnp.where(m, b.pos[safe], zero2),
        vel=jnp.where(m, b.vel[safe], zero2),
        mass=jnp.where(alive, b.mass[safe], 0.0),
        density=jnp.where(alive, b.density[safe], 0.0),
        pressure=jnp.where(alive, b.pressure[safe], 0.0),
        active=alive,
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
    pair_fn: Callable[[Carry, dict[str, jax.Array], dict[str, jax.Array]], Carry],
    init: Carry,
    halo: tuple[dict, dict] | None = None,
    local_cells: int | None = None,
) -> Carry:
    """Fold ``pair_fn`` over all neighbor slabs, blocked over cells.

    ``fields`` maps name -> flat [S, ...] array. ``init`` is a pytree of
    flat per-slot accumulators [S, ...]. For every block of
    ``grid.block_cells`` cells and every one of the 3^(dim-1) slabs,
    ``pair_fn(carry, home, win)`` receives:

      carry  pytree of [blk, cap, ...] accumulators for the home block
      home   dict of [blk, cap, ...] home-slot field blocks
      win    dict of [blk, 3*cap, ...] neighbor-window field blocks

    and returns the updated carry. Returns accumulators reassembled to the
    flat [S, ...] layout.

    TPU design notes: each block reads ONE contiguous haloed window per
    field (``lax.dynamic_slice`` — no gathers; the halo is the leading-axes
    stride so every slab of the block lies inside the window). Blocking
    bounds the pair temporaries to [blk, cap, 3cap] regardless of grid
    size, which is what keeps 3D grids inside HBM (unblocked, XLA
    materialises [num_cells, cap, 3cap] temps and OOMs at ~50k cells).
    The slab loop is a static Python loop; the block loop is a
    ``lax.scan`` so compiled code size stays O(1) in grid size.

    Multi-chip: with ``halo=(lo_fields, hi_fields)`` and ``local_cells``,
    the fold operates on a device-local contiguous slab of cells whose
    out-of-shard neighbor rows were exchanged explicitly (ppermute over
    ICI — parallel/halo.py) instead of zero-padded; each halo dict holds
    [padc*cap, ...] rows (padc = halo_cells(grid)).
    """
    cap = grid.cap
    C = local_cells if local_cells is not None else grid.num_cells
    shifts = grid.slab_shifts()
    blk = grid.block_cells if grid.block_cells else C
    blk = min(blk, C)
    nblk = -(-C // blk)
    padc = max(abs(s) for s in shifts) + 1  # halo cells on each side
    win_cells = blk + 2 * padc

    def pad_rows(k, x):
        tail_rows = (padc + nblk * blk - C) * cap
        if halo is None:
            front = jnp.zeros((padc * cap,) + x.shape[1:], x.dtype)
            back = jnp.zeros((tail_rows,) + x.shape[1:], x.dtype)
        else:
            front = halo[0][k]
            back = jnp.concatenate(
                [
                    halo[1][k],
                    jnp.zeros(
                        ((tail_rows - padc * cap),) + x.shape[1:], x.dtype
                    ),
                ]
            ) if tail_rows > padc * cap else halo[1][k][: tail_rows]
        return jnp.concatenate([front, x, back])

    padded = {k: pad_rows(k, v) for k, v in fields.items()}

    def tail(x):
        return x.shape[1:]

    # Per-block occupancy, computed once and vectorized (one O(S) pass)
    # BEFORE the scan. Empty home blocks (no particles -> all masses 0)
    # produce no output; with the gravity axis leading, the fluid-free part
    # of the domain is a contiguous run of such blocks. The cond below
    # executes only the taken branch, AND the window dynamic_slices live
    # inside it — a skipped block costs neither compute nor the HBM reads
    # of its field windows (round 1 sliced before the cond, so every
    # skipped block still streamed ~win_cells*cap rows of every field).
    use_skip = grid.skip_empty_blocks and nblk > 1 and "mass" in fields
    if use_skip:
        m = fields["mass"]
        tail_rows = nblk * blk * cap - C * cap
        mflat = jnp.concatenate([m, jnp.zeros((tail_rows,), m.dtype)]) if tail_rows else m
        blk_occ = jnp.any((mflat > 0).reshape(nblk, blk * cap), axis=1)

    def body(_, b):
        zero = jax.tree.map(
            lambda a: jnp.zeros((blk, cap) + tail(a), a.dtype), init
        )

        def compute(_):
            start = b * (blk * cap)
            win = {
                k: lax.dynamic_slice_in_dim(v, start, win_cells * cap, axis=0)
                for k, v in padded.items()
            }
            home = {
                k: w[padc * cap : (padc + blk) * cap].reshape(
                    (blk, cap) + tail(w)
                )
                for k, w in win.items()
            }
            carry = zero
            for sh in shifts:
                base = (padc + sh - 1) * cap
                slab = {
                    k: _window_view(w[base : base + (blk + 2) * cap], blk, cap)
                    for k, w in win.items()
                }
                carry = pair_fn(carry, home, slab)
            return carry

        if use_skip:
            carry = lax.cond(blk_occ[b], compute, lambda _: zero, None)
        else:
            carry = compute(None)
        return None, carry

    _, stacked = lax.scan(body, None, jnp.arange(nblk, dtype=jnp.int32))
    # [nblk, blk, cap, ...] -> flat [C*cap, ...]
    return jax.tree.map(
        lambda a: a.reshape((nblk * blk * cap,) + a.shape[3:])[: C * cap], stacked
    )


def halo_cells(grid: BinnedGrid) -> int:
    """Cells of halo each side a local fold needs (= max slab reach + 1)."""
    return max(abs(s) for s in grid.slab_shifts()) + 1


def _window_view(w: jax.Array, blk: int, cap: int) -> jax.Array:
    """[blk*cap + 2*cap, ...] contiguous rows -> [blk, 3*cap, ...] windows.

    Window of cell c covers cells (c-1, c, c+1): three overlapping reshapes
    of the same contiguous slab, concatenated — pure slices, no gather.
    """
    tail = w.shape[1:]
    n = blk * cap
    parts = [w[0:n], w[cap : cap + n], w[2 * cap : 2 * cap + n]]
    blocks = [p.reshape((blk, cap) + tail) for p in parts]
    return jnp.concatenate(blocks, axis=1)


def cell_view(grid: BinnedGrid, x: jax.Array) -> jax.Array:
    """Flat [S, ...] -> per-cell [num_cells, cap, ...] view of home slots."""
    return x.reshape((grid.num_cells, grid.cap) + x.shape[1:])


def flat_view(grid: BinnedGrid, x: jax.Array) -> jax.Array:
    """Inverse of cell_view."""
    return x.reshape((grid.num_slots,) + x.shape[2:])
