"""Hardware sweep: skin_frac UPWARD from 0.25 (1M 3D dam break).

The round-2 skin sweep (scripts/sweep_skin.py) only went DOWN from 0.25
(0.18/0.12/0.08 — all worse: more cells at the same 128-lane padding).
The upward direction was never measured, and the lane arithmetic says it
should win: the window's lane dim is 3*cap padded to 128, so cap 32
(96 lanes) wastes 25% of every vector op while cap 40 (120 lanes) wastes
6%; meanwhile cells (and with them window-plumbing + dispatch, 47%+10%
of the step per PERF.md) shrink by (cell_ratio)^3. Per-slot pair math is
flat-to-down: cells/1.26 * cap 40/32 ~ 0.99x at skin 0.35, 0.89x at 0.40.

For PBF there is a second, larger effect: the rebin drift threshold is
skin/2, and at skin 0.25 the flagship fires ~1.0 rebins/step (~107 ms,
~19% of the step). A larger skin widens the bin epoch while the
projection cap (proj_cap_h — h-relative, grid-independent) stays the
same physical length — identical physics, fewer rebins.

Occupancy guardrails (measured p100 true occupancy 27 at skin 0.25 over
a full 1M run, ROADMAP item 2/3): p100 scales with cell volume ->
0.35: 34 (cap 40 auto, 2.0x mean headroom)  0.40: 38 (cap 40 manual,
1.8x) — overflow is counted and printed per arm.

Interleaved reps (tunnel drift hits all arms equally); min + median.
Run (TPU, background):
PYTHONPATH=/root/repo:/root/.axon_site python scripts/sweep_skin_up.py [n] [reps]
"""


from __future__ import annotations

import os as _os, sys as _sys  # bare-runnable: repo root on sys.path
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import os
import sys
import time

import jax

if os.environ.get("SPH_SWEEP_CPU"):  # CPU smoke (sitecustomize pins axon)
    jax.config.update("jax_platforms", "cpu")

import numpy as np

from sph_pie_tpu.scenes import dam_break_3d
from sph_pie_tpu.solvers import pbf, wcsph_binned


def sync(x):
    return float(np.asarray(jax.device_get(x)))


def make_arms(n):
    return [
        ("s0.25_c32", dict(skin_frac=0.25)),
        ("s0.35_c40", dict(skin_frac=0.35)),
        ("s0.40_c40", dict(skin_frac=0.40, bcap=40)),
    ]


def run_solver(tag, scenes, mk_roll, reps, steps=10):
    rolls, states = {}, {}
    for label, scene in scenes:
        roll, b0 = mk_roll(scene)
        t0 = time.perf_counter()
        b1 = roll(b0)
        sync(b1.pos[0, 0])
        print(
            json.dumps(
                {
                    "solver": tag,
                    "arm": label,
                    "compile_s": round(time.perf_counter() - t0, 1),
                    "num_cells": scene.bgrid.num_cells,
                    "cap": scene.bgrid.cap,
                    "home_tier": scene.bgrid.home_tier,
                }
            ),
            flush=True,
        )
        rolls[label] = roll
        states[label] = b1
    walls = {label: [] for label, _ in scenes}
    for r in range(reps):
        for label, scene in scenes:
            b = states[label]
            r0 = int(np.asarray(b.n_rebins))
            t0 = time.perf_counter()
            b2 = rolls[label](b)
            sync(b2.pos[0, 0])
            dt_ms = (time.perf_counter() - t0) / steps * 1e3
            states[label] = b2
            walls[label].append(dt_ms)
            rho = np.asarray(b2.density)[np.asarray(b2.valid)]
            rho0 = float(np.asarray(scene.params.rest_density))
            print(
                json.dumps(
                    {
                        "solver": tag,
                        "arm": label,
                        "rep": r,
                        "step_ms": round(dt_ms, 1),
                        "rebins_per_step": (int(np.asarray(b2.n_rebins)) - r0)
                        / steps,
                        "overflow": int(np.asarray(b2.overflow)),
                        "rho_p99": round(float(np.percentile(rho, 99)) / rho0, 4),
                        "vmax": round(float(np.abs(np.asarray(b2.vel)).max()), 2),
                    }
                ),
                flush=True,
            )
    for label, w in walls.items():
        w = sorted(w)
        print(
            json.dumps(
                {
                    "solver": tag,
                    "arm": label,
                    "min_ms": round(w[0], 1),
                    "med_ms": round(w[len(w) // 2], 1),
                }
            ),
            flush=True,
        )


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    solvers = sys.argv[3] if len(sys.argv) > 3 else "wcsph,pbf"
    steps = 10

    scenes = []
    for label, kw in make_arms(n):
        scenes.append((label, dam_break_3d(n_target=n, **kw)))

    if "wcsph" in solvers:

        def mk_wcsph(scene):
            params, grid = scene.params, scene.bgrid

            def roll(bb):
                return wcsph_binned.simulate(params, grid, bb, steps)

            b0 = scene.binned_state()
            b0 = wcsph_binned.simulate(params, grid, b0, 5)  # settle+compile
            sync(b0.pos[0, 0])
            return roll, b0

        run_solver("wcsph", scenes, mk_wcsph, reps, steps)

    if "pbf" in solvers:

        def mk_pbf(scene):
            params, grid = scene.params, scene.bgrid
            pp = pbf.flagship_params()

            def roll(bb):
                return pbf.simulate(params, grid, pp, bb, steps)

            b0 = scene.binned_state()
            b0 = pbf.simulate(params, grid, pp, b0, 3)
            sync(b0.pos[0, 0])
            return roll, b0

        run_solver("pbf", scenes, mk_pbf, reps, steps)

    print("done", flush=True)


if __name__ == "__main__":
    main()
