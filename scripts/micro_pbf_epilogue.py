"""Hardware A/B: PBF epilogue="gather" vs "ride" (1M flagship).

gather: 2 compact [K]-row stashes + 4 [S]<-[K] owner gathers per step
        (S ~ 8.4x K at 1M); mid-step rebins light (pos/mass only).
ride:   zero gathers — pos0 rides the dead vel payload, rho_prev rides
        the density column; every fired rebin carries 4 extra sort
        operands + scatters.

Physics identical (tests/test_pbf.py::test_pbf_epilogue_ride_matches_gather
holds to 1e-6 over 60 steps incl. periodic seams); this measures the data
movement. Companion: scripts/micro_gather.py times the raw gather shapes.

Interleaved reps; min + median. Run (TPU, background):
PYTHONPATH=/root/repo:/root/.axon_site python scripts/micro_pbf_epilogue.py [n] [reps]
"""


from __future__ import annotations

import os as _os, sys as _sys  # bare-runnable: repo root on sys.path
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import sys
import time

import jax
import numpy as np

from sph_pie_tpu.scenes import dam_break_3d
from sph_pie_tpu.solvers import pbf


def sync(x):
    return float(np.asarray(jax.device_get(x)))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    steps = 10
    scene = dam_break_3d(n_target=n)
    grid, params = scene.bgrid, scene.params

    arms = {m: pbf.flagship_params(epilogue=m) for m in ("gather", "ride")}

    b0 = scene.binned_state()
    b0 = pbf.simulate(params, grid, arms["gather"], b0, 3)
    sync(b0.pos[0, 0])

    rolls = {}
    for label, pp in arms.items():
        fn = jax.jit(
            lambda bb, ppp=pp: pbf.simulate(params, grid, ppp, bb, steps)
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

    walls = {k: [] for k in arms}
    for r in range(reps):
        for label, fn in rolls.items():
            r0 = int(np.asarray(b0.n_rebins))
            t0 = time.perf_counter()
            b2 = fn(b0)
            sync(b2.pos[0, 0])
            dt_ms = (time.perf_counter() - t0) / steps * 1e3
            walls[label].append(dt_ms)
            print(
                json.dumps(
                    {
                        "arm": label,
                        "rep": r,
                        "step_ms": round(dt_ms, 1),
                        "rebins_per_step": (int(np.asarray(b2.n_rebins)) - r0)
                        / steps,
                        "overflow": int(np.asarray(b2.overflow)),
                    }
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
                    "psteps_per_s_at_min": round(n / (w[0] / 1e3)),
                }
            ),
            flush=True,
        )
    print("done", flush=True)


if __name__ == "__main__":
    main()
