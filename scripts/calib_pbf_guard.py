"""Calibrate a CHEAP default-tier PBF quality guard (VERDICT r03 #4).

Goal: a short-horizon 2D collapse bar that (a) PASSES pbf.flagship_params()
and the iters=4 default, (b) FAILS the two retracted round-3 perf configs
(iters=3/sor=0.8 with proj_cap_h 1/24 and 0.0625 — the tuples that shipped
briefly while the 500-step bar only lived in the slow tier), and (c) runs
in seconds on the 1-CPU mesh so `make check` catches the next bad tuple.

Prints spread/h, vmax, rho_q90/rho0 for each (config, horizon) so the bar
can be picked with margin on both sides.
"""

import os as _os, sys as _sys  # bare-runnable: repo root on sys.path
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time

import numpy as np

from sph_pie_tpu.neighbors import binned as nb
from sph_pie_tpu.scenes import builders
from sph_pie_tpu.solvers import pbf

CONFIGS = {
    "flagship(2,0.9,.0625)": pbf.flagship_params(),
    "default(4,0.8,.075)": pbf.make_pbf_params(iters=4),
    "RETRACTED(3,0.8,1/24)": pbf.make_pbf_params(iters=3, proj_cap_h=1.0 / 24),
    "RETRACTED(3,0.8,.0625)": pbf.make_pbf_params(iters=3, proj_cap_h=0.0625),
}

HORIZONS = (150, 250, 350, 500)


def main():
    for n_target in (300, 400):
        scene = builders.dam_break_2d(n_target=n_target)
        h = float(scene.params.h)
        rho0 = float(scene.params.rest_density)
        act0 = np.asarray(scene.state.active)
        x0 = np.asarray(scene.state.pos)[act0][:, 0].max()
        print(f"== n_target={n_target} (h={h:.4f}) ==")
        for name, pp in CONFIGS.items():
            b = scene.binned_state()
            done = 0
            t0 = time.time()
            for horizon in HORIZONS:
                b = pbf.simulate(
                    scene.params, scene.bgrid, pp, b, horizon - done
                )
                done = horizon
                st = nb.unbin(scene.bgrid, b, scene.state.capacity)
                act = np.asarray(st.active)
                pos = np.asarray(st.pos)[act]
                vel = np.asarray(st.vel)[act]
                rho = np.asarray(st.density)[act]
                spread = (pos[:, 0].max() - x0) / h
                vmax = np.abs(vel).max()
                q90 = np.quantile(rho, 0.9) / rho0
                print(
                    f"  {name:24s} steps={horizon:4d} spread={spread:6.2f}h "
                    f"vmax={vmax:5.2f} rho_q90={q90:6.3f} "
                    f"wall={time.time() - t0:5.1f}s"
                )


if __name__ == "__main__":
    main()
