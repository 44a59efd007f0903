"""Hardware A/B: Pallas expand rebin vs the XLA scatter rebin (round 4).

The rebin's scatter side is scalar-transaction-bound (micro_rebin2.py:
9-column scatters 61.5 ms standalone at 1M; hint/c64 routes dead). The
reworked pallas_rebin.expand (scalar-prefetch spec, density column added)
replaces the scatters + the dense zero-init with per-cell VMEM copies.

Arms (interleaved, one process; jitted separately under each branch of
the _PALLAS_EXPAND global, which is read at trace time):
  rebin_scat / rebin_pal      nb.rebin(carry_density=True)  [PBF ride]
  rebin_scat_w / rebin_pal_w  nb.rebin()                    [WCSPH]
  step_scat / step_pal        one full PBF flagship step

Run (TPU, background):
PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/micro_rebin4.py [n] [reps]
"""


from __future__ import annotations

import os as _os, sys as _sys  # bare-runnable: repo root on sys.path
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import sys
import time

import jax
import numpy as np

import sph_pie_tpu.neighbors.binned as nb
from sph_pie_tpu.scenes import dam_break_3d
from sph_pie_tpu.solvers import pbf


def sync(x):
    leaf = jax.tree.leaves(x)[0]
    return float(np.asarray(leaf.ravel()[0]))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    scene = dam_break_3d(n_target=n)
    g = scene.bgrid
    b = scene.binned_state()
    fp = pbf.flagship_params()
    b = pbf.simulate(scene.params, g, fp, b, 5)
    sync(b.pos)
    print(json.dumps({"n": n, "cap": g.cap, "cells": g.num_cells,
                      "S": g.num_slots}), flush=True)

    steps_too = "--steps" in sys.argv  # full-step arms cost ~20 min compile
    fns = {}
    for tag, flag in (("pal", True), ("scat", False)):  # pal first: fail fast
        nb._PALLAS_EXPAND = flag
        fns[f"rebin_{tag}"] = jax.jit(
            lambda bb, _f=flag: nb.rebin(g, bb, carry_density=True))
        fns[f"rebin_{tag}_w"] = jax.jit(
            lambda bb, _f=flag: nb.rebin(g, bb))
        if steps_too:
            fns[f"step_{tag}"] = jax.jit(
                lambda bb, _f=flag: pbf.step(scene.params, g, fp, bb))
        # force trace NOW, while the global holds this branch
        for k in [f"rebin_{tag}", f"rebin_{tag}_w"] + (
                [f"step_{tag}"] if steps_too else []):
            sync(fns[k](b))
            print(json.dumps({"compiled": k}), flush=True)
    nb._PALLAS_EXPAND = None

    # parity on hardware (exact: same sort, same drop semantics)
    a = fns["rebin_scat"](b)
    c = fns["rebin_pal"](b)
    ok = all(
        bool((np.asarray(getattr(a, f)) == np.asarray(getattr(c, f))).all())
        for f in ("pos", "vel", "mass", "density", "owner", "slot_of")
    )
    print(json.dumps({"bit_parity": ok,
                      "overflow": [int(a.overflow), int(c.overflow)]}),
          flush=True)

    times: dict[str, list] = {}
    for r in range(reps):
        row = {}
        for label, fn in fns.items():
            o = fn(b)
            sync(o)
            t0 = time.perf_counter()
            for _ in range(3):
                o = fn(b)
            sync(o)
            ms = (time.perf_counter() - t0) / 3 * 1e3
            times.setdefault(label, []).append(ms)
            row[label] = round(ms, 2)
        print(json.dumps({"rep": r, **row}), flush=True)
    mins = {k: round(min(v), 2) for k, v in times.items()}
    mins["speedup_rebin"] = round(mins["rebin_scat"] / mins["rebin_pal"], 3)
    mins["speedup_rebin_w"] = round(
        mins["rebin_scat_w"] / mins["rebin_pal_w"], 3)
    print(json.dumps({"MIN": mins}), flush=True)


if __name__ == "__main__":
    main()
