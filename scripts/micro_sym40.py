"""Hardware A/B: cap-40 sym Pallas density kernel vs the XLA fold (1M).

The skin-0.40/cap-40 scene default (measured win, ROADMAP item 13a)
disabled the routed sym density kernel, which was cap-32-only. This
measures the cap-generalized kernel (3 cells/128-lane row + 8 filler
lanes) at the new default geometry:

  * density standalone: fold vs pallas_sym.density_sym
  * full WCSPH step: pair_kernel="fold" vs "auto" (auto routes density
    through the kernel on TPU at >= 20k cells)

Interleaved reps, min + median; correctness rel err printed once.
Run (TPU, background):
PYTHONPATH=/root/repo:/root/.axon_site python scripts/micro_sym40.py [n] [reps]
"""


from __future__ import annotations

import os as _os, sys as _sys  # bare-runnable: repo root on sys.path
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import sys
import time

import jax
import numpy as np

from sph_pie_tpu.neighbors import pallas_sym
from sph_pie_tpu.scenes import dam_break_3d
from sph_pie_tpu.solvers import wcsph_binned
from sph_pie_tpu.utils.struct import replace


def sync(x):
    return float(np.asarray(jax.device_get(x)))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    steps = 10
    scene = dam_break_3d(n_target=n)
    g = scene.bgrid
    print(
        json.dumps({"n": n, "cap": g.cap, "cells": g.num_cells}), flush=True
    )
    b = scene.binned_state()
    b = wcsph_binned.simulate(scene.params, g, b, 3)
    sync(b.pos[0, 0])

    g_fold = replace(g, pair_kernel="fold")
    arms = {}

    # standalone density
    df = jax.jit(lambda bb: wcsph_binned._density(scene.params, g_fold, bb))
    dk = jax.jit(lambda bb: pallas_sym.density_sym(scene.params, g, bb))
    r_f, r_k = df(b), dk(b)
    valid = np.asarray(b.valid)
    a, c = np.asarray(r_f)[valid], np.asarray(r_k)[valid]
    print(
        json.dumps(
            {"density_rel_err": float(np.abs(a - c).max() / np.abs(a).max())}
        ),
        flush=True,
    )
    arms["density_fold"] = (df, lambda out: out[0])
    arms["density_sym40"] = (dk, lambda out: out[0])

    # full step roll
    sf = jax.jit(
        lambda bb: wcsph_binned.simulate(scene.params, g_fold, bb, steps)
    )
    sa = jax.jit(lambda bb: wcsph_binned.simulate(scene.params, g, bb, steps))
    for label, fn in (("step_fold", sf), ("step_auto", sa)):
        t0 = time.perf_counter()
        sync(fn(b).pos[0, 0])
        print(
            json.dumps(
                {"arm": label, "compile_s": round(time.perf_counter() - t0, 1)}
            ),
            flush=True,
        )
    rolls = {}
    for r in range(reps):
        for label, (fn, pick) in arms.items():
            t0 = time.perf_counter()
            for _ in range(5):
                out = fn(b)
            sync(pick(out))
            ms = (time.perf_counter() - t0) / 5 * 1e3
            rolls.setdefault(label, []).append(ms)
            print(
                json.dumps({"arm": label, "rep": r, "ms": round(ms, 2)}),
                flush=True,
            )
        for label, fn in (("step_fold", sf), ("step_auto", sa)):
            t0 = time.perf_counter()
            sync(fn(b).pos[0, 0])
            ms = (time.perf_counter() - t0) / steps * 1e3
            rolls.setdefault(label, []).append(ms)
            print(
                json.dumps(
                    {"arm": label, "rep": r, "step_ms": round(ms, 2)}
                ),
                flush=True,
            )
    for label, ts in rolls.items():
        print(
            json.dumps(
                {
                    "arm": label,
                    "min_ms": round(min(ts), 1),
                    "med_ms": round(sorted(ts)[len(ts) // 2], 1),
                }
            ),
            flush=True,
        )
    print("done", flush=True)


if __name__ == "__main__":
    main()
