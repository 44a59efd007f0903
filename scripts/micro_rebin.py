"""Break down rebin cost at 1M on the real TPU + candidate v2 pieces."""

import os as _os, sys as _sys  # bare-runnable: repo root on sys.path
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp
import numpy as np

from sph_pie_tpu.neighbors import binned as nb
from sph_pie_tpu.scenes import dam_break_3d


def sync(x):
    return float(np.asarray(jax.device_get(jax.tree.leaves(x)[0]).ravel()[0]))


def bench(name, fn, *args, reps=5):
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    sync(out)
    ms = (time.perf_counter() - t0) / reps * 1e3
    print(f"{name}: {ms:.2f} ms", flush=True)
    return ms


scene = dam_break_3d(n_target=1_000_000)
g = scene.bgrid
b = scene.binned_state()
K = scene.state.capacity
print(f"K={K} S={g.num_slots}", flush=True)

bench("rebin_full_current", jax.jit(lambda bb: nb.rebin(g, bb)), b)
bench("compact_only", jax.jit(lambda bb: nb._compact(g, bb)), b)


def bin_rows_only(bb):
    pos, vel, mass, alive = nb._compact(g, bb)
    return pos, vel, mass, alive


pos, vel, mass, alive = jax.jit(bin_rows_only)(b)
owner = jnp.arange(K, dtype=jnp.int32)
bench(
    "bin_rows_only",
    jax.jit(lambda p, v, m, a: nb._bin_rows(g, p, v, m, owner, a)),
    pos, vel, mass, alive,
)

# v2 pieces: multi-operand sort carrying payloads + cummax rank
def v2_sort(p, v, m, a):
    cid = nb._cell_ids(g, p, a)
    ops = (cid, p[:, 0], p[:, 1], p[:, 2], v[:, 0], v[:, 1], v[:, 2], m, owner)
    out = jax.lax.sort(ops, num_keys=1)
    scid = out[0]
    n = scid.shape[0]
    iota = jnp.arange(n, dtype=jnp.int32)
    start = jnp.where(
        jnp.concatenate([jnp.ones((1,), jnp.bool_), scid[1:] != scid[:-1]]),
        iota,
        0,
    )
    first = jax.lax.associative_scan(jnp.maximum, start)
    rank = iota - first
    fits = (rank < g.cap) & (scid < g.num_cells)
    slot = jnp.where(fits, scid * g.cap + rank, g.num_slots)
    return out, slot, fits


bench("v2_sort_rank", jax.jit(v2_sort), pos, vel, mass, alive)


def v2_full(p, v, m, a):
    out, slot, fits = v2_sort(p, v, m, a)
    S = g.num_slots
    dt = p.dtype
    scid, px, py, pz, vx, vy, vz, sm, sown = out

    def scat(rows, width=None):
        return jnp.zeros((S,), rows.dtype).at[slot].set(rows, mode="drop")

    return nb.BinnedState(
        pos=jnp.stack([scat(px), scat(py), scat(pz)], axis=-1),
        vel=jnp.stack([scat(vx), scat(vy), scat(vz)], axis=-1),
        mass=scat(sm),
        density=jnp.zeros((S,), dt),
        pressure=jnp.zeros((S,), dt),
        valid=jnp.zeros((S,), jnp.bool_).at[slot].set(fits, mode="drop"),
        owner=jnp.full((S,), -1, jnp.int32).at[slot].set(sown, mode="drop"),
        slot_of=jnp.full((K,), S, jnp.int32).at[sown].set(slot, mode="drop"),
        bin_pos=jnp.stack([scat(px), scat(py), scat(pz)], axis=-1),
        travel=jnp.zeros((), dt),
        overflow=jnp.sum((nb._cell_ids(g, p, a) < g.num_cells).astype(jnp.int32))
        - jnp.sum(fits.astype(jnp.int32)),
        n_rebins=jnp.zeros((), jnp.int32),
        sim_time=jnp.zeros((), dt),
    )


bench("v2_full(sort+rank+scatter)", jax.jit(v2_full), pos, vel, mass, alive)

# how much do the dense scatters cost in-graph?
def scatters_only(p, v, m, a):
    slot = jnp.clip(nb._cell_ids(g, p, a) * g.cap, 0, g.num_slots)
    S = g.num_slots
    return (
        jnp.zeros((S,), p.dtype).at[slot].set(p[:, 0], mode="drop"),
        jnp.zeros((S,), p.dtype).at[slot].set(v[:, 0], mode="drop"),
        jnp.zeros((S,), p.dtype).at[slot].set(m, mode="drop"),
    )


bench("three_S_scatters_shared_idx", jax.jit(scatters_only), pos, vel, mass, alive)

# displacement readback: max |pos - pos0| per step cost
pos0 = b.pos


def disp(bb):
    d = bb.pos - pos0
    return jnp.sqrt(jnp.max(jnp.sum(d * d, axis=-1)))


bench("max_displacement_S", jax.jit(disp), b)
print("done", flush=True)
