"""Hardware A/B: fold block-scan unroll factor (1M WCSPH step).

PERF.md attributes ~14.3 ms/step to dispatch gaps and ~6.4 ms to
while/cond overhead — both scale with the ~351 while iterations per fold
phase. lax.scan(unroll=k) packs k block bodies per iteration: fewer
dispatch boundaries, same math (CPU equivalence is exact — identical
summation order).

Interleaved reps; min + median. Run (TPU, background):
PYTHONPATH=/root/repo:/root/.axon_site python scripts/micro_unroll.py [n] [reps]
"""


from __future__ import annotations

import os as _os, sys as _sys  # bare-runnable: repo root on sys.path
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import dataclasses
import json
import sys
import time

import jax
import numpy as np

from sph_pie_tpu.scenes import dam_break_3d
from sph_pie_tpu.solvers import wcsph_binned


def sync(x):
    return float(np.asarray(jax.device_get(x)))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    steps = 10
    scene = dam_break_3d(n_target=n)
    params = scene.params

    grids = {
        f"unroll{k}": dataclasses.replace(scene.bgrid, scan_unroll=k)
        for k in (1, 2, 4)
    }

    b0 = scene.binned_state()
    b0 = wcsph_binned.simulate(params, grids["unroll1"], b0, 5)
    sync(b0.pos[0, 0])

    rolls = {}
    for label, g in grids.items():
        fn = jax.jit(
            lambda bb, gg=g: wcsph_binned.simulate(params, gg, bb, steps)
        )
        t0 = time.perf_counter()
        sync(fn(b0).pos[0, 0])
        print(
            json.dumps(
                {"arm": label, "compile_s": round(time.perf_counter() - t0, 1)}
            ),
            flush=True,
        )
        rolls[label] = fn

    walls = {k: [] for k in grids}
    for r in range(reps):
        for label, fn in rolls.items():
            t0 = time.perf_counter()
            b2 = fn(b0)
            sync(b2.pos[0, 0])
            dt_ms = (time.perf_counter() - t0) / steps * 1e3
            walls[label].append(dt_ms)
            print(
                json.dumps(
                    {"arm": label, "rep": r, "step_ms": round(dt_ms, 1)}
                ),
                flush=True,
            )
    for label, w in walls.items():
        w = sorted(w)
        print(
            json.dumps(
                {
                    "arm": label,
                    "min_ms": round(w[0], 1),
                    "med_ms": round(w[len(w) // 2], 1),
                }
            ),
            flush=True,
        )
    print("done", flush=True)


if __name__ == "__main__":
    main()
