"""Hardware microbench: PBF phase split at 1M (VERDICT r02 weak #2).

Times each fold phase standalone, the full step, and counts how often
rebins actually FIRE across a rolled window (the cost model differs 5x
depending on whether the 5 maybe_rebin checks per step trigger sorts or
merely compare travel).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/micro_pbf.py [N]
"""


from __future__ import annotations

import os as _os, sys as _sys  # bare-runnable: repo root on sys.path
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import sys
import time

import jax
import numpy as np

from sph_pie_tpu.neighbors import binned as nb
from sph_pie_tpu.scenes import dam_break_3d
from sph_pie_tpu.solvers import pbf
from sph_pie_tpu.solvers.wcsph_binned import _planar
from sph_pie_tpu.utils.struct import replace


def sync(x):
    return float(np.asarray(jax.device_get(x)))


def timeit(fn, *args, reps=3):
    out = fn(*args)
    sync(jax.tree.leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    sync(jax.tree.leaves(out)[0].ravel()[0])
    return (time.perf_counter() - t0) / reps * 1e3, out


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    scene = dam_break_3d(n_target=n)
    grid = scene.bgrid
    params = scene.params
    pp = pbf.make_pbf_params(iters=3)
    print(json.dumps({"n": n, "iters": pp.iters}), flush=True)

    b = scene.binned_state()
    b = pbf.simulate(params, grid, pp, b, 3)  # settle + compile
    sync(b.pos[0, 0])

    fields = {**_planar("p", b.pos), "mass": b.mass}

    lam_fn = jax.jit(lambda bb: pbf._lambda_fold(
        params, pp, grid, {**_planar("p", bb.pos), "mass": bb.mass}))
    t_lam, (lam, rho) = timeit(lam_fn, b)
    print(json.dumps({"lambda_fold_ms": round(t_lam, 2)}), flush=True)

    dx_fn = jax.jit(lambda bb, lam: pbf._dx_fold(
        params, pp, grid, {**_planar("p", bb.pos), "mass": bb.mass, "lam": lam}))
    t_dx, _ = timeit(dx_fn, b, lam)
    print(json.dumps({"dx_fold_ms": round(t_dx, 2)}), flush=True)

    xs_fn = jax.jit(lambda bb: pbf._density_xsph_fold(
        params, grid, bb.pos, bb.vel, bb.mass,
        bb.mass / params.rest_density))
    t_xs, _ = timeit(xs_fn, b)
    print(json.dumps({"density_xsph_fold_ms": round(t_xs, 2)}), flush=True)

    reb_fn = jax.jit(lambda bb: nb.rebin(grid, bb))
    t_reb, _ = timeit(reb_fn, b)
    print(json.dumps({"rebin_ms": round(t_reb, 2)}), flush=True)

    rebl_fn = jax.jit(lambda bb: nb.rebin(grid, bb, light=True))
    t_rebl, _ = timeit(rebl_fn, b)
    print(json.dumps({"rebin_light_ms": round(t_rebl, 2)}), flush=True)

    # full step + rebin fire rate over a window; proj_cap_frac is traced,
    # so the sweep reuses one compilation. Density stats gauge the
    # quality cost of tighter caps (harder clipping of the most violent
    # projections).
    step_fn = jax.jit(
        lambda bb, pparams: pbf.simulate(params, grid, pparams, bb, 10)
    )
    for frac in (0.5, 0.3, 0.25):
        pp_f = pbf.make_pbf_params(iters=3, proj_cap_h=frac * 0.25)
        r0 = int(np.asarray(b.n_rebins))
        t_roll, b2 = timeit(step_fn, b, pp_f, reps=1)
        r1 = int(np.asarray(b2.n_rebins))
        rho = np.asarray(b2.density)[np.asarray(b2.valid)]
        rho0 = float(np.asarray(params.rest_density))
        print(
            json.dumps(
                {
                    "proj_cap_frac": round(frac, 4),
                    "step_ms": round(t_roll / 10, 2),
                    "rebins_per_step": (r1 - r0) / 10,
                    "overflow": int(np.asarray(b2.overflow)),
                    "rho_mean_over_rho0": round(float(rho.mean()) / rho0, 4),
                    "rho_p99_over_rho0": round(
                        float(np.percentile(rho, 99)) / rho0, 4
                    ),
                    "rho_max_over_rho0": round(float(rho.max()) / rho0, 4),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
