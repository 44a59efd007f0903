"""Localize the hardware-vs-fold mismatch of the Pallas density kernel.

Runs density twice (XLA fold, Pallas) at small-ish N on the real chip and
maps the mismatching slots to (block, cell-in-block, lane-class, rank).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/debug_pallas_hw.py [N]
"""

import os as _os, sys as _sys  # bare-runnable: repo root on sys.path
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import sys

import jax
import numpy as np

from sph_pie_tpu.neighbors import pallas_pair
from sph_pie_tpu.scenes import dam_break_3d
from sph_pie_tpu.solvers import wcsph_binned


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 30_000
    scene = dam_break_3d(n_target=n)
    g = scene.bgrid
    b = scene.binned_state()
    print(json.dumps({"n": n, "cap": g.cap, "cells": g.num_cells}), flush=True)

    rho_f = np.asarray(jax.jit(lambda bb: wcsph_binned._density(scene.params, g, bb))(b))
    rho_p = np.asarray(jax.jit(lambda bb: pallas_pair.density_pallas(scene.params, g, bb))(b))
    valid = np.asarray(b.valid)

    err = np.abs(rho_p - rho_f) / np.maximum(np.abs(rho_f), 1e-6)
    bad = (err > 1e-4) & valid
    nbad = int(bad.sum())
    print(json.dumps({"bad_slots": nbad, "valid": int(valid.sum())}), flush=True)
    if nbad == 0:
        return

    idx = np.nonzero(bad)[0]
    cap = g.cap
    cells = idx // cap
    ranks = idx % cap
    # lane class = which of the 4 cap-32 cells within a 128-lane row
    cls = cells % 4
    from sph_pie_tpu.neighbors.pallas_pair import BLK

    blocks = cells // BLK
    cell_in_blk = cells % BLK
    print(
        json.dumps(
            {
                "rank_hist": np.bincount(ranks, minlength=cap).tolist(),
                "class_hist": np.bincount(cls, minlength=4).tolist(),
                "n_blocks_bad": int(np.unique(blocks).size),
                "blocks_bad_first": np.unique(blocks)[:12].tolist(),
                "cell_in_blk_min": int(cell_in_blk.min()),
                "cell_in_blk_max": int(cell_in_blk.max()),
                "err_max": float(err[bad].max()),
                "err_median": float(np.median(err[bad])),
            }
        ),
        flush=True,
    )
    # Are bad cells near block boundaries?
    near_edge = ((cell_in_blk < 8) | (cell_in_blk >= BLK - 8)).mean()
    print(json.dumps({"frac_bad_near_blk_edge": float(near_edge)}), flush=True)
    # distribution of cell_in_blk among bad
    h, _ = np.histogram(cell_in_blk, bins=16, range=(0, BLK))
    print(json.dumps({"cell_in_blk_hist16": h.tolist()}), flush=True)


if __name__ == "__main__":
    main()
