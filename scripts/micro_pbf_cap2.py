"""Hardware: PBF 1M cap sweep at iters=2, sor=0.9 (one compile, cap traced).

Follows scripts/micro_pbf_ab.py's result that (2, 0.9, 0.3) runs 579.9 ms
vs the incumbent (3, 0.8, 0.3) 727.3 in-process. The remaining rebin rate
(1.6/step) is cap-driven; this sweeps the cap at fixed iters/sor.

Run (TPU, background):
PYTHONPATH=/root/repo:/root/.axon_site python scripts/micro_pbf_cap2.py
"""


from __future__ import annotations

import os as _os, sys as _sys  # bare-runnable: repo root on sys.path
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import time

import jax
import numpy as np

from sph_pie_tpu.scenes import dam_break_3d
from sph_pie_tpu.solvers import pbf


def sync(x):
    return float(np.asarray(jax.device_get(x)))


def main():
    n = 1_000_000
    scene = dam_break_3d(n_target=n)
    grid, params = scene.bgrid, scene.params

    pp0 = pbf.make_pbf_params(iters=2, sor=0.9, proj_cap_h=0.075)
    b0 = scene.binned_state()
    b0 = pbf.simulate(params, grid, pp0, b0, 3)
    sync(b0.pos[0, 0])

    fn = jax.jit(lambda bb, ppp: pbf.simulate(params, grid, ppp, bb, 10))
    sync(fn(b0, pp0).pos[0, 0])  # compile once

    rho0 = float(np.asarray(params.rest_density))
    for rep in range(3):
        for cap in (0.3, 0.25, 0.2):
            pp = pbf.make_pbf_params(iters=2, sor=0.9, proj_cap_h=cap * 0.25)
            r0 = int(np.asarray(b0.n_rebins))
            t0 = time.perf_counter()
            b2 = fn(b0, pp)
            sync(b2.pos[0, 0])
            dt_ms = (time.perf_counter() - t0) / 10 * 1e3
            rho = np.asarray(b2.density)[np.asarray(b2.valid)]
            print(
                json.dumps(
                    {
                        "cap": cap,
                        "rep": rep,
                        "step_ms": round(dt_ms, 1),
                        "rebins_per_step": (int(np.asarray(b2.n_rebins)) - r0)
                        / 10,
                        "overflow": int(np.asarray(b2.overflow)),
                        "rho_p99": round(float(np.percentile(rho, 99)) / rho0, 4),
                        "rho_max": round(float(rho.max()) / rho0, 4),
                        "psteps_per_s": round(n / (dt_ms / 1e3)),
                    }
                ),
                flush=True,
            )
    print("done", flush=True)


if __name__ == "__main__":
    main()
