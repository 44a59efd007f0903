"""Hardware A/B: PBF 1M step at (iters=3,sor=0.8) vs (iters=2,sor=0.9).

Quality calibration (scripts/sweep_pbf_iters.py, 2D collapse scene):
(2, 0.9, 0.3) passes ALL three calibrated bars (spread>1.5h, vmax<10,
rho_q90<1.15) while the round-3 incumbent (3, 0.8, 0.3) fails vmax
(11.9). Two Jacobi iterations at sor 0.9 have a residual factor
comparable to three at 0.8 ((1-0.9mu)^2 vs (1-0.8mu)^3) and drop one
lambda+dx fold pair plus ~1 mid-step rebin per step.

Interleaved reps so tunnel drift hits both arms equally; min + median
reported. Run (TPU, background):
PYTHONPATH=/root/repo:/root/.axon_site python scripts/micro_pbf_ab.py
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
    scene = dam_break_3d(n_target=n)
    grid, params = scene.bgrid, scene.params

    arms = {
        "i3_s0.8": pbf.make_pbf_params(iters=3, sor=0.8, proj_cap_h=0.075),
        "i2_s0.9": pbf.make_pbf_params(iters=2, sor=0.9, proj_cap_h=0.075),
    }

    b0 = scene.binned_state()
    b0 = pbf.simulate(params, grid, arms["i3_s0.8"], b0, 3)  # settle
    sync(b0.pos[0, 0])

    step_fns = {
        k: jax.jit(lambda bb, ppp=pp: pbf.simulate(params, grid, ppp, bb, 10))
        for k, pp in arms.items()
    }
    # compile both arms before timing
    for k, fn in step_fns.items():
        t0 = time.perf_counter()
        sync(fn(b0).pos[0, 0])
        print(
            json.dumps({"arm": k, "compile_s": round(time.perf_counter() - t0, 1)}),
            flush=True,
        )

    walls = {k: [] for k in arms}
    rho0 = float(np.asarray(params.rest_density))
    for r in range(reps):
        for k, fn in step_fns.items():
            r0 = int(np.asarray(b0.n_rebins))
            t0 = time.perf_counter()
            b2 = fn(b0)
            sync(b2.pos[0, 0])
            dt_ms = (time.perf_counter() - t0) / 10 * 1e3
            walls[k].append(dt_ms)
            rho = np.asarray(b2.density)[np.asarray(b2.valid)]
            print(
                json.dumps(
                    {
                        "arm": k,
                        "rep": r,
                        "step_ms": round(dt_ms, 1),
                        "rebins_per_step": (int(np.asarray(b2.n_rebins)) - r0)
                        / 10,
                        "overflow": int(np.asarray(b2.overflow)),
                        "rho_p99": round(float(np.percentile(rho, 99)) / rho0, 4),
                        "rho_max": round(float(rho.max()) / rho0, 4),
                        "vmax": round(float(np.abs(np.asarray(b2.vel)).max()), 2),
                    }
                ),
                flush=True,
            )
    for k, w in walls.items():
        w = sorted(w)
        print(
            json.dumps(
                {
                    "arm": k,
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
