"""HISTORICAL harness — the kernel it measures was trimmed.

Hardware A/B: sym Pallas FORCES kernel vs the XLA fold (ask: VERDICT
r03 #9 / ROADMAP round-4 starter 2c — trim-or-route decision).
OUTCOME (v5e 1M skin 0.40/cap 40, 2026-08-19): fold 89.7 ms vs sym40
151.4 = 0.59x, rel err 7.4e-7 — DEAD; the forces half of
neighbors/pallas_sym.py was cut (ROADMAP ledger item 18). To re-run,
check out a revision at or before commit 2f29983.

The forces half of neighbors/pallas_sym.py measured 0.73-0.89x the fold
on the round-2/3 toolchain and is routed nowhere by default. One
re-benchmark at the current default geometry (skin 0.40 / cap 40)
decides: if still < 1x, the forces half gets cut (density half stays —
it wins 1.29x and is routed).

Interleaved reps, min + median; correctness rel err printed once.
Run (TPU, background):
PYTHONPATH=/root/repo:/root/.axon_site python scripts/micro_sym_forces.py [n] [reps]
"""


from __future__ import annotations

import os as _os, sys as _sys  # bare-runnable: repo root on sys.path
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import sys
import time

import jax
import numpy as np

from sph_pie_tpu.kernels import eos
from sph_pie_tpu.neighbors import pallas_sym
from sph_pie_tpu.scenes import dam_break_3d
from sph_pie_tpu.solvers import wcsph_binned
from sph_pie_tpu.utils.struct import replace


def sync(x):
    return float(np.asarray(jax.device_get(x)))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    scene = dam_break_3d(n_target=n, surface_tension=0.0)
    g = scene.bgrid
    print(json.dumps({"n": n, "cap": g.cap, "cells": g.num_cells}), flush=True)
    b = scene.binned_state()
    b = wcsph_binned.simulate(scene.params, g, b, 3)
    rho = wcsph_binned._density(scene.params, g, b)
    b = replace(b, density=rho, pressure=eos.tait_pressure(scene.params, rho))
    sync(b.pos[0, 0])

    g_fold = replace(g, pair_kernel="fold")
    ff = jax.jit(lambda bb: wcsph_binned._forces(scene.params, g_fold, bb))
    fk = jax.jit(lambda bb: pallas_sym.forces_sym(scene.params, g, bb))
    a_f, _ = ff(b)
    a_k, _ = fk(b)
    valid = np.asarray(b.valid)
    a, c = np.asarray(a_f)[valid], np.asarray(a_k)[valid]
    print(
        json.dumps(
            {"forces_rel_err": float(np.abs(a - c).max() / np.abs(a).max())}
        ),
        flush=True,
    )

    rolls = {}
    for r in range(reps):
        for label, fn in (("forces_fold", ff), ("forces_sym40", fk)):
            out = fn(b)
            sync(out[0].ravel()[0])
            t0 = time.perf_counter()
            for _ in range(5):
                out = fn(b)
            sync(out[0].ravel()[0])
            ms = (time.perf_counter() - t0) / 5 * 1e3
            rolls.setdefault(label, []).append(ms)
            print(
                json.dumps({"arm": label, "rep": r, "ms": round(ms, 2)}),
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
