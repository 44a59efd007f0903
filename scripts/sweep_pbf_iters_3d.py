"""3D confirmation probe for the PBF iteration sweep (sweep_pbf_iters.py).

Small 3D dam break, 200 steps: incompressibility quantiles, speeds, and
rebin counts per config. Run (CPU):
PYTHONPATH=. JAX_PLATFORMS=cpu python scripts/sweep_pbf_iters_3d.py
"""


from __future__ import annotations

import os as _os, sys as _sys  # bare-runnable: repo root on sys.path
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json

import jax
import numpy as np

jax.config.update("jax_platforms", "cpu")

from sph_pie_tpu.neighbors import binned as nb  # noqa: E402
from sph_pie_tpu.scenes import dam_break_3d  # noqa: E402
from sph_pie_tpu.solvers import pbf  # noqa: E402

CONFIGS = [(3, 0.8, 0.3), (2, 0.9, 0.3), (2, 1.0, 0.3)]


def main():
    scene = dam_break_3d(n_target=2000)
    rho0 = float(scene.params.rest_density)
    h = float(scene.params.h)
    act0 = np.asarray(scene.state.active)
    x0 = np.asarray(scene.state.pos)[act0][:, 0].max()

    for iters, sor, cap in CONFIGS:
        pp = pbf.make_pbf_params(iters=iters, sor=sor, proj_cap_h=cap * 0.25)
        b = scene.binned_state()
        b = pbf.simulate(scene.params, scene.bgrid, pp, b, 150)
        st = nb.unbin(scene.bgrid, b, scene.state.capacity)
        act = np.asarray(st.active)
        pos = np.asarray(st.pos)[act]
        vel = np.asarray(st.vel)[act]
        rho = np.asarray(st.density)[act]
        print(
            json.dumps(
                {
                    "iters": iters,
                    "sor": sor,
                    "cap": cap,
                    "spread_h": round(float((pos[:, 0].max() - x0) / h), 3),
                    "vmax": round(float(np.abs(vel).max()), 3),
                    "rho_q90": round(float(np.quantile(rho, 0.9) / rho0), 4),
                    "rho_max": round(float(rho.max() / rho0), 4),
                    "rebins": int(b.n_rebins),
                    "overflow": int(b.overflow),
                    "finite": bool(np.isfinite(pos).all()),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
