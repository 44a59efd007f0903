"""Hardware A/B: Pallas expand rebin vs the XLA scatter rebin — minimal.

micro_rebin4.py's PBF settle costs ~17 min of compile per attempt; this
variant measures the rebin arms alone on the INITIAL dam-break binning
(dense block — realistic first/count occupancy) so a compile-or-die
iteration fits minutes, with the persistent compile cache on.

Run (TPU, background):
PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/micro_rebin5.py [n] [reps]
"""


from __future__ import annotations

import os as _os, sys as _sys  # bare-runnable: repo root on sys.path
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import os
import sys
import time

import jax
import numpy as np

d = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache")
jax.config.update("jax_compilation_cache_dir", d)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import sph_pie_tpu.neighbors.binned as nb  # noqa: E402
from sph_pie_tpu.scenes import dam_break_3d  # noqa: E402


def sync(x):
    leaf = jax.tree.leaves(x)[0]
    return float(np.asarray(leaf.ravel()[0]))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    scene = dam_break_3d(n_target=n)
    g = scene.bgrid
    b = scene.binned_state()
    sync(b.pos)
    print(json.dumps({"n": n, "cap": g.cap, "cells": g.num_cells,
                      "S": g.num_slots}), flush=True)

    fns = {}
    for tag, flag in (("pal", True), ("scat", False)):  # pal first: fail fast
        nb._PALLAS_EXPAND = flag
        fns[f"rebin_{tag}"] = jax.jit(
            lambda bb, _f=flag: nb.rebin(g, bb, carry_density=True))
        fns[f"rebin_{tag}_w"] = jax.jit(
            lambda bb, _f=flag: nb.rebin(g, bb))
        for k in (f"rebin_{tag}", f"rebin_{tag}_w"):
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
