"""Ledger item 22 — VMEM-local neighbor compaction (VERDICT r04 #3).

The last unrun experiment class on the single-chip ledger: per cell
block, compact the ~4%-useful candidate slots into dense pair lists
ENTIRELY inside VMEM and run the pair math only on those.  The HBM
scatter/gather pair-list died in items 1-8; this measures the VMEM
variant the ledger has never priced.

Scope (smallest honest version per the ask): density only, ONE slab
(the center slab, shift 0), 1M flagship geometry, interleaved reps.

Arms (identical inputs: home fields [C, cap->128] + the materialised
center-slab window [C, 3cap->128] per field):

  xla_dense      pure-XLA dense evaluation over all 120 candidates
                 (the production fold's math on this slab)
  pallas_dense   Pallas kernel, same dense math — isolates Pallas-vs-XLA
                 on identical work so the compaction delta is clean
  pallas_compact Pallas kernel that ranks masked candidates with a
                 roll-ladder lane cumsum, then extracts pair k by a
                 one-hot lane reduction (k = 1..K) and evaluates poly6
                 only on the K compacted pairs — all in VMEM
  xla_eval_floor pure-XLA poly6 over PRE-compacted [K, C*cap] pair
                 values (built untimed via chunked top_k) — the per-use floor a
                 reusable compacted list could ever reach IF index
                 gathers were free (they are not: positions move every
                 step, so a reusable list must store indices, and each
                 use pays a gather >= the one-hot extraction cost)

Run (TPU, background):
  python scripts/micro_compact.py [n] [reps] [K] [blkc]
"""

from __future__ import annotations

import os as _os, sys as _sys  # bare-runnable: repo root on sys.path
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import functools
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sph_pie_tpu.neighbors import binned as nb
from sph_pie_tpu.scenes import dam_break_3d
from sph_pie_tpu.solvers import wcsph_binned

LANE = 128


def sync(x):
    return float(np.asarray(jax.device_get(x)))


def _poly6_term(h2, coeff, r2):
    w = jnp.maximum(h2 - r2, 0.0)
    return coeff * w * w * w


def _lane_cumsum(x):
    """Inclusive cumsum along the 128-lane axis via a roll ladder
    (log2(128) = 7 rounds of non-negative pltpu.roll + wrapped-lane
    masking) — Mosaic-safe: no lane reshapes, no gathers."""
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    for s in (1, 2, 4, 8, 16, 32, 64):
        rolled = pltpu.roll(x, shift=s, axis=x.ndim - 1)
        x = x + jnp.where(lane >= s, rolled, 0.0)
    return x


def _dense_kernel(h2, coeff, hx, hy, hz, hm, wx, wy, wz, wm, out):
    dx = wx[:, :][:, None, :] - hx[:, :][:, :, None]
    dy = wy[:, :][:, None, :] - hy[:, :][:, :, None]
    dz = wz[:, :][:, None, :] - hz[:, :][:, :, None]
    r2 = dx * dx + dy * dy + dz * dz
    contrib = _poly6_term(h2, coeff, r2) * wm[:, :][:, None, :]
    out[:, :] = jnp.sum(contrib, axis=-1)


def _compact_kernel(h2, coeff, K, hx, hy, hz, hm, wx, wy, wz, wm, out):
    dx = wx[:, :][:, None, :] - hx[:, :][:, :, None]
    dy = wy[:, :][:, None, :] - hy[:, :][:, :, None]
    dz = wz[:, :][:, None, :] - hz[:, :][:, :, None]
    r2 = dx * dx + dy * dy + dz * dz
    wmb = wm[:, :][:, None, :] + jnp.zeros_like(r2)
    mask = (r2 < h2) & (wmb > 0.0)
    maskf = jnp.where(mask, 1.0, 0.0)
    rank = _lane_cumsum(maskf)  # 1-based rank on masked lanes
    rho = jnp.zeros(out.shape, out.dtype)
    for k in range(1, K + 1):
        sel = jnp.where(mask & (rank == float(k)), 1.0, 0.0)
        # sel is one-hot per (cell, slot) row: these reductions ARE the
        # compacted extraction of pair k's (r2, mass)
        cr2 = jnp.sum(r2 * sel, axis=-1)
        cm = jnp.sum(wmb * sel, axis=-1)
        rho = rho + _poly6_term(h2, coeff, cr2) * cm
    out[:, :] = rho


def _make_arm(kernel_body, nblk, blkc, cap):
    home = pl.BlockSpec((blkc, cap), lambda i: (i, 0))
    win = pl.BlockSpec((blkc, LANE), lambda i: (i, 0))
    return pl.pallas_call(
        kernel_body,
        grid=(nblk,),
        in_specs=[home] * 4 + [win] * 4,
        out_specs=pl.BlockSpec((blkc, cap), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((nblk * blkc, cap), jnp.float32),
        interpret=_os.environ.get("SPH_PIE_INTERPRET", "") == "1",
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    K = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    blkc = int(sys.argv[4]) if len(sys.argv) > 4 else 16

    scene = dam_break_3d(n_target=n)
    g = scene.bgrid
    cap, C = g.cap, g.num_cells
    h = float(g.cell_size - g.skin)
    h2, coeff = h * h, 315.0 / (64.0 * np.pi * h**9)
    print(json.dumps({"n": n, "cap": cap, "cells": C, "K": K, "blkc": blkc}),
          flush=True)

    b = scene.binned_state()
    b = wcsph_binned.simulate(scene.params, g, b, 3)
    sync(b.pos[0, 0])

    # ---- shared inputs: home fields + materialised center-slab window
    si = g.slab_shifts().index(0)
    nblk = -(-C // blkc)
    Cp = nblk * blkc

    def padC(x2d, lanes):
        out = jnp.zeros((Cp, lanes), jnp.float32)
        return out.at[:C, : x2d.shape[1]].set(x2d)

    @jax.jit
    def build_inputs(bb):
        wpos = nb.slab_windows(g, bb.pos)[si]          # [C, 3cap, 3]
        wmass = nb.slab_windows(g, bb.mass)[si]        # [C, 3cap]
        hpos = bb.pos.reshape(C, cap, 3)
        hmass = bb.mass.reshape(C, cap)
        hx, hy, hz = (padC(hpos[..., a], cap) for a in range(3))
        hm = padC(hmass, cap)
        wx, wy, wz = (padC(wpos[..., a], LANE) for a in range(3))
        wm = padC(wmass, LANE)
        return hx, hy, hz, hm, wx, wy, wz, wm

    inputs = build_inputs(b)
    sync(inputs[0][0, 0])

    # ---- arms
    dense = _make_arm(
        functools.partial(_dense_kernel, h2, coeff), nblk, blkc, cap
    )
    compact = _make_arm(
        functools.partial(_compact_kernel, h2, coeff, K), nblk, blkc, cap
    )

    @jax.jit
    def xla_dense(hx, hy, hz, hm, wx, wy, wz, wm):
        dx = wx[:, None, :] - hx[:, :, None]
        dy = wy[:, None, :] - hy[:, :, None]
        dz = wz[:, None, :] - hz[:, :, None]
        r2 = dx * dx + dy * dy + dz * dz
        return jnp.sum(
            _poly6_term(h2, coeff, r2) * wm[:, None, :], axis=-1
        )

    pallas_dense = jax.jit(lambda *a: dense(*a))
    pallas_compact = jax.jit(lambda *a: compact(*a))

    # ---- evaluation floor: pre-compacted pair values via top_k (untimed
    # build).  Chunked with lax.map: the unchunked [Cp, cap, 128] top_k
    # materialised 3x5.1 GB sort temps and OOMed 16 GB HBM.  Stored as
    # [K, Cp*cap] — K on the sublane axis, the flat (cell, slot) index
    # minor — so storage is unpadded (a [Cp, cap, K] layout pads the
    # 32-lane minor dim to 128, a 4x blow-up) and the floor eval is a
    # cheap sublane reduction.
    CH = next(c for c in range(16, 0, -1) if Cp % c == 0)
    rows = Cp // CH

    @jax.jit
    def build_compacted(hx, hy, hz, hm, wx, wy, wz, wm):
        def one(chunk):
            chx, chy, chz, cwx, cwy, cwz, cwm = chunk
            dx = cwx[:, None, :] - chx[:, :, None]
            dy = cwy[:, None, :] - chy[:, :, None]
            dz = cwz[:, None, :] - chz[:, :, None]
            r2 = dx * dx + dy * dy + dz * dz
            mask = (r2 < h2) & (cwm[:, None, :] > 0.0)
            r2m = jnp.where(mask, r2, jnp.inf)
            neg, idx = jax.lax.top_k(-r2m, K)      # K nearest per row
            cr2 = -neg
            cm = jnp.take_along_axis(
                jnp.broadcast_to(cwm[:, None, :], r2.shape), idx, axis=-1
            )
            cm = jnp.where(jnp.isfinite(cr2), cm, 0.0)
            cr2 = jnp.where(jnp.isfinite(cr2), cr2, 0.0)
            nk = jnp.sum(mask, axis=-1)
            return (
                cr2.transpose(2, 0, 1).reshape(K, rows * cap),
                cm.transpose(2, 0, 1).reshape(K, rows * cap),
                jnp.sum(jnp.maximum(nk - K, 0)),
                jnp.sum(nk > 0),
                jnp.max(nk),
            )

        chunks = tuple(
            a.reshape(CH, rows, a.shape[1])
            for a in (hx, hy, hz, wx, wy, wz, wm)
        )
        cr2c, cmc, ovf, nr, mx = jax.lax.map(one, chunks)
        # [CH, K, rows*cap] -> [K, Cp*cap] preserving flat c*cap+s order
        cr2f = cr2c.transpose(1, 0, 2).reshape(K, Cp * cap)
        cmf = cmc.transpose(1, 0, 2).reshape(K, Cp * cap)
        return cr2f, cmf, jnp.sum(ovf), jnp.sum(nr), jnp.max(mx)

    cr2, cm, overflow, nrows, max_nk = build_compacted(*inputs)
    sync(cr2[0, 0])

    @jax.jit
    def xla_eval_floor(cr2, cm):
        w = _poly6_term(h2, coeff, cr2) * cm       # [K, Cp*cap]
        return jnp.sum(w, axis=0).reshape(Cp, cap)

    # ---- correctness (valid home slots only)
    valid = np.asarray(b.valid).reshape(C, cap)
    ref = np.asarray(xla_dense(*inputs))[:C][valid]
    got_d = np.asarray(pallas_dense(*inputs))[:C][valid]
    got_c = np.asarray(pallas_compact(*inputs))[:C][valid]
    got_f = np.asarray(xla_eval_floor(cr2, cm))[:C][valid]
    scale = np.abs(ref).max()
    print(json.dumps({
        "rel_err_pallas_dense": float(np.abs(ref - got_d).max() / scale),
        "rel_err_pallas_compact": float(np.abs(ref - got_c).max() / scale),
        "rel_err_eval_floor": float(np.abs(ref - got_f).max() / scale),
        "overflow_pairs_beyond_K": int(overflow),
        "occupied_home_rows": int(nrows),
        "max_slab_neighbors": int(max_nk),
    }), flush=True)

    # ---- interleaved timing
    arms = {
        "xla_dense": (lambda: xla_dense(*inputs)),
        "pallas_dense": (lambda: pallas_dense(*inputs)),
        "pallas_compact": (lambda: pallas_compact(*inputs)),
        "xla_eval_floor": (lambda: xla_eval_floor(cr2, cm)),
    }
    rolls = {}
    for r in range(reps):
        for label, fn in arms.items():
            out = fn()
            sync(out[0, 0])  # warm/compile settled before the window
            t0 = time.perf_counter()
            for _ in range(5):
                out = fn()
            sync(out[0, 0])
            ms = (time.perf_counter() - t0) / 5 * 1e3
            rolls.setdefault(label, []).append(ms)
            print(json.dumps({"arm": label, "rep": r, "ms": round(ms, 3)}),
                  flush=True)
    summary = {
        label: {"min_ms": round(min(ts), 3),
                "med_ms": round(sorted(ts)[len(ts) // 2], 3)}
        for label, ts in rolls.items()
    }
    summary["compact_vs_dense"] = round(
        min(rolls["pallas_dense"]) / min(rolls["pallas_compact"]), 3
    )
    summary["floor_vs_xla_dense"] = round(
        min(rolls["xla_dense"]) / min(rolls["xla_eval_floor"]), 3
    )
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
