"""Hardware A/B: complex64 column-pair packing for the rebin hot path.

micro_rebin2.py decomposed the 1M flagship rebin (125 ms) into compact
gathers 58 + sort 15 + dense scatters 61.5 (standalone; in-graph XLA
fuses some) and measured the deployable scatter hints DEAD (unique-only
1.00x). The remaining structure: the rebin is bound by ~17M scalar
random accesses (9 columns x 1M rows, gather + scatter) at ~7 ns each —
HBM transaction count, not bandwidth. Packing two f32 columns into one
complex64 halves the transaction count without changing a single bit
(complex is used as a 64-bit carrier, no arithmetic): 8 f32 payload
columns -> 4 c64, so 4 gathers + 4 c64 scatters + 1 owner scatter
instead of 8 + 9, and the multi-operand sort carries 6 operands
instead of 10.

Arms (interleaved, one process):
  rebin_cur    nb.rebin(carry_density=True) as shipped
  compact_c64  pack dense -> 4 c64 gathers -> unpack   (vs compact 58)
  scat_c64     4 c64 zero scatters + owner             (vs scat 61.5)
  rebin_c64    end-to-end packed rebin, bit-parity-checked vs rebin_cur

Run (TPU, background):
PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/micro_rebin3.py [n] [reps]
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
    leaf = jax.tree.leaves(x)[0]
    return float(np.asarray(leaf.ravel()[0].real))


def pack2(a, b):
    return jax.lax.complex(a, b)


def rebin_c64(grid, b):
    """nb.rebin(carry_density=True) with c64-packed payload columns."""
    S = grid.num_slots
    cap = grid.cap
    safe = jnp.clip(b.slot_of, 0, S - 1)
    # pack the dense payload: 4 full-S elementwise passes (bandwidth,
    # ~0.2 ms each) buy scalar-transaction halving on the gathers
    d01 = pack2(b.pos[:, 0], b.pos[:, 1])
    d2v0 = pack2(b.pos[:, 2], b.vel[:, 0])
    dv12 = pack2(b.vel[:, 1], b.vel[:, 2])
    dmd = pack2(b.mass, b.density)
    g01, g2v0, gv12, gmd = d01[safe], d2v0[safe], dv12[safe], dmd[safe]
    alive = b.slot_of < S
    K = safe.shape[0]
    pos = jnp.stack([g01.real, g01.imag, g2v0.real], axis=-1)
    cid = nb._cell_ids(grid, pos, alive)
    owner = jnp.arange(K, dtype=jnp.int32)
    sorted_ops = jax.lax.sort(
        (cid, g01, g2v0, gv12, gmd, owner), num_keys=1
    )
    scid = sorted_ops[0]
    s01, s2v0, sv12, smd = sorted_ops[1:5]
    sowner = sorted_ops[5]
    iota = jnp.arange(K, dtype=jnp.int32)
    is_start = jnp.concatenate(
        [jnp.ones((1,), jnp.bool_), scid[1:] != scid[:-1]]
    )
    first = jax.lax.associative_scan(
        jnp.maximum, jnp.where(is_start, iota, 0)
    )
    rank = iota - first
    fits = (rank < cap) & (scid < grid.num_cells)
    slot = jnp.where(fits, scid * cap + rank, S)

    def scat(col):
        return jnp.zeros((S,), col.dtype).at[slot].set(col, mode="drop")

    e01, e2v0, ev12, emd = scat(s01), scat(s2v0), scat(sv12), scat(smd)
    owner_d = jnp.full((S,), -1, jnp.int32).at[slot].set(sowner, mode="drop")
    pos_d = jnp.stack([e01.real, e01.imag, e2v0.real], axis=-1)
    vel_d = jnp.stack([e2v0.imag, ev12.real, ev12.imag], axis=-1)
    mass_d = emd.real
    dens_d = emd.imag
    valid_d = mass_d > 0
    dt = b.pos.dtype
    return nb.BinnedState(
        pos=pos_d,
        vel=vel_d,
        mass=mass_d,
        density=dens_d,
        pressure=jnp.zeros((S,), dt),
        valid=valid_d,
        owner=jnp.where(valid_d, owner_d, -1),
        slot_of=jnp.full((K,), S, jnp.int32).at[sowner].set(slot, mode="drop"),
        bin_pos=pos_d,
        travel=jnp.zeros((), dt),
        overflow=jnp.sum((cid < grid.num_cells).astype(jnp.int32))
        - jnp.sum(fits.astype(jnp.int32)),
        n_rebins=b.n_rebins + 1,
        sim_time=b.sim_time,
    )


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    scene = dam_break_3d(n_target=n)
    g = scene.bgrid
    b = scene.binned_state()
    b = pbf.simulate(scene.params, g, pbf.flagship_params(), b, 5)
    sync(b.pos)
    S, cap = g.num_slots, g.cap
    print(json.dumps({"n": n, "cap": cap, "cells": g.num_cells, "S": S}),
          flush=True)

    f_cur = jax.jit(lambda bb: nb.rebin(g, bb, carry_density=True))
    f_c64 = jax.jit(lambda bb: rebin_c64(g, bb))

    # bit parity: packing is a 64-bit carrier, results must be exact
    a, c = f_cur(b), f_c64(b)
    ok = all(
        bool((np.asarray(getattr(a, f)) == np.asarray(getattr(c, f))).all())
        for f in ("pos", "vel", "mass", "density", "owner", "slot_of")
    )
    print(json.dumps({"bit_parity": ok,
                      "overflow": [int(a.overflow), int(c.overflow)]}),
          flush=True)

    # standalone halves
    safe = jnp.clip(b.slot_of, 0, S - 1)

    def compact_c64(bb):
        sf = jnp.clip(bb.slot_of, 0, S - 1)
        return (
            pack2(bb.pos[:, 0], bb.pos[:, 1])[sf],
            pack2(bb.pos[:, 2], bb.vel[:, 0])[sf],
            pack2(bb.vel[:, 1], bb.vel[:, 2])[sf],
            pack2(bb.mass, bb.density)[sf],
        )

    f_gc = jax.jit(compact_c64)
    cols = f_gc(b)
    K = cols[0].shape[0]
    slot = jnp.clip(b.slot_of, 0, S)  # realistic mostly-hit slot vector
    sown = jnp.arange(K, dtype=jnp.int32)

    def scat_c64(sl, cs, ow):
        out = tuple(
            jnp.zeros((S,), c.dtype).at[sl].set(c, mode="drop") for c in cs
        )
        return out + (
            jnp.full((S,), -1, jnp.int32).at[sl].set(ow, mode="drop"),
        )

    f_sc = jax.jit(scat_c64)

    arms = [
        ("rebin_cur", lambda: f_cur(b)),
        ("rebin_c64", lambda: f_c64(b)),
        ("compact_c64", lambda: f_gc(b)),
        ("scat_c64", lambda: f_sc(slot, cols, sown)),
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
