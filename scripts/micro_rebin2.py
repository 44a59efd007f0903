"""Round-4 rebin decomposition at the CURRENT flagship geometry (skin
0.40 / cap 40, ride payload: pos+vel+mass+density) + the sorted/unique
scatter-hint candidates (VERDICT r03 #5).

Why now: micro_pbf_resid.py showed the PBF step at 1M is folds 268.6 +
rebin 120.0 x 0.5 fires + scaffold 9.7 ms — the "O(S) epilogue residual"
is only ~10 ms, so the rebin IS the non-fold lever. _bin_rows's dense
scatters use indices that are provably SORTED and UNIQUE (slot =
scid*cap + rank with scid sorted ascending and rank incrementing; drops
map to num_slots, past the end) but the .at[] calls never say so — XLA
must assume collisions. This measures what the hints are worth, plus a
full component split.

Arms (interleaved, min-of-reps, one process):
  rebin_cur      nb.rebin(carry_density=True) as shipped
  compact        the 4 [K]<-[S] payload gathers (slot_of order)
  sortrank       10-operand lax.sort + cummax rank + slot
  scat_plain     9 column scatters, no hints (the shipped pattern)
  scat_hint      same with indices_are_sorted=True, unique_indices=True
  scat1_plain/hint  single-column scatter A/B
  zeros9         materialize the 9 zero targets alone (bounds the init)

Run (TPU, background):
PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/micro_rebin2.py [n] [reps]
"""


from __future__ import annotations

import os as _os, sys as _sys  # bare-runnable: repo root on sys.path
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from sph_pie_tpu.neighbors import binned as nb
from sph_pie_tpu.scenes import dam_break_3d
from sph_pie_tpu.solvers import pbf


def sync(x):
    # Scalar-only readback: index on device FIRST. device_get of the whole
    # leaf ships the full array through the tunnel (43-128 MB here), which
    # swamps every timing (observed: zeros9 "costing" 320 ms).
    leaf = jax.tree.leaves(x)[0]
    return float(np.asarray(leaf.ravel()[0]))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    scene = dam_break_3d(n_target=n)
    g = scene.bgrid
    b = scene.binned_state()
    # settle into a realistic occupancy profile + a carried density column
    b = pbf.simulate(scene.params, g, pbf.flagship_params(), b, 5)
    sync(b.pos)
    S, cap = g.num_slots, g.cap
    print(json.dumps({"n": n, "cap": cap, "cells": g.num_cells, "S": S}),
          flush=True)

    f_rebin = jax.jit(lambda bb: nb.rebin(g, bb, carry_density=True))

    def compact(bb):
        safe = jnp.clip(bb.slot_of, 0, S - 1)
        return bb.pos[safe], bb.vel[safe], bb.mass[safe], bb.density[safe]

    f_compact = jax.jit(compact)
    pos, vel, mass, dens = f_compact(b)
    K = pos.shape[0]
    owner = jnp.arange(K, dtype=jnp.int32)

    def sortrank(p, v, m, d):
        cid = nb._cell_ids(g, p, jnp.ones((K,), jnp.bool_))
        ops = (cid, p[:, 0], p[:, 1], p[:, 2], v[:, 0], v[:, 1], v[:, 2],
               d, m, owner)
        out = jax.lax.sort(ops, num_keys=1)
        scid = out[0]
        iota = jnp.arange(K, dtype=jnp.int32)
        start = jnp.where(
            jnp.concatenate([jnp.ones((1,), jnp.bool_), scid[1:] != scid[:-1]]),
            iota, 0)
        first = jax.lax.associative_scan(jnp.maximum, start)
        rank = iota - first
        fits = (rank < cap) & (scid < g.num_cells)
        slot = jnp.where(fits, scid * cap + rank, S)
        return out, slot

    f_sortrank = jax.jit(sortrank)
    out, slot = f_sortrank(pos, vel, mass, dens)
    cols = list(out[1:9])  # 8 float columns (3 pos, 3 vel, dens, mass)
    sown = out[9]

    def scats(slot_, cols_, sown_, **hints):
        dense = [
            jnp.zeros((S,), c.dtype).at[slot_].set(c, mode="drop", **hints)
            for c in cols_
        ]
        dense.append(
            jnp.full((S,), -1, jnp.int32).at[slot_].set(
                sown_, mode="drop", **hints))
        return tuple(dense)

    f_plain = jax.jit(lambda s, c, o: scats(s, c, o))
    f_hint = jax.jit(lambda s, c, o: scats(
        s, c, o, indices_are_sorted=True, unique_indices=True))
    # Deployable variant: overflow sentinels break sortedness (a dropped
    # row lands mid-array), and the shared sentinel S breaks uniqueness —
    # but sentinel S+iota is provably UNIQUE regardless of overflow, so
    # unique_indices=True alone is always safe once the sentinel is
    # de-shared (mode="drop" still discards everything >= S).
    iota_k = jnp.arange(K, dtype=jnp.int32)
    f_uniq = jax.jit(lambda s, c, o: scats(
        jnp.where(s < S, s, S + iota_k), c, o, unique_indices=True))
    f_s1p = jax.jit(lambda s, c: jnp.zeros((S,), c.dtype).at[s].set(
        c, mode="drop"))
    f_s1h = jax.jit(lambda s, c: jnp.zeros((S,), c.dtype).at[s].set(
        c, mode="drop", indices_are_sorted=True, unique_indices=True))
    f_z9 = jax.jit(lambda: tuple(jnp.zeros((S,), jnp.float32) + i
                                 for i in range(9)))
    # correctness: hinted == plain
    a = np.asarray(f_plain(slot, cols, sown)[0])
    c_ = np.asarray(f_hint(slot, cols, sown)[0])
    print(json.dumps({"hint_matches": bool((a == c_).all())}), flush=True)

    arms = [
        ("rebin_cur", lambda: f_rebin(b)),
        ("compact", lambda: f_compact(b)),
        ("sortrank", lambda: f_sortrank(pos, vel, mass, dens)),
        ("scat_plain", lambda: f_plain(slot, cols, sown)),
        ("scat_hint", lambda: f_hint(slot, cols, sown)),
        ("scat_uniq", lambda: f_uniq(slot, cols, sown)),
        ("scat1_plain", lambda: f_s1p(slot, cols[0])),
        ("scat1_hint", lambda: f_s1h(slot, cols[0])),
        ("zeros9", f_z9),
    ]
    times: dict[str, list] = {}
    for r in range(reps):
        row = {}
        for label, fn in arms:
            o = fn()
            sync(o)
            t0 = time.perf_counter()
            for _ in range(3):
                o = fn()
            sync(o)
            ms = (time.perf_counter() - t0) / 3 * 1e3
            times.setdefault(label, []).append(ms)
            row[label] = round(ms, 2)
        print(json.dumps({"rep": r, **row}), flush=True)
    print(json.dumps(
        {"MIN": {k: round(min(v), 2) for k, v in times.items()}}), flush=True)


if __name__ == "__main__":
    main()
