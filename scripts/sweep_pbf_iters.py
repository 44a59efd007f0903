"""Quality sweep: PBF (iters, sor, proj_cap_frac) vs the calibrated bars.

The incumbent default (iters=3, sor=0.8, cap=0.3) spends 3x(lambda+dx)
folds + ~2 mid-step rebins at 1M. Jacobi relaxation theory says 2
iterations at sor~1.0 have a comparable residual factor ((1-mu)^2 vs
(1-0.8mu)^3), one fewer fold pair (~145 ms) and one fewer rebin — IF the
physics bars hold. This sweep measures, per config, on the 2D collapse
scene (tests/test_pbf.py):

  * spread bar: xmax gain at 500 steps must exceed 1.5h (collapse test)
  * speed bar: |v|max < 10 m/s (blow-up detector)
  * incompressibility: q90 and max of rho/rho0 at the end (settle test
    bar is q90 < 1.15)

Run (CPU): PYTHONPATH=. JAX_PLATFORMS=cpu python scripts/sweep_pbf_iters.py
"""


from __future__ import annotations

import os as _os, sys as _sys  # bare-runnable: repo root on sys.path
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json

import jax
import numpy as np

jax.config.update("jax_platforms", "cpu")

from sph_pie_tpu.neighbors import binned as nb  # noqa: E402
from sph_pie_tpu.scenes import builders  # noqa: E402
from sph_pie_tpu.solvers import pbf  # noqa: E402

CONFIGS = [
    # (iters, sor, cap)  — first row is the incumbent default
    (3, 0.8, 0.3),
    (3, 1.0, 0.3),
    (2, 0.9, 0.3),
    (2, 1.0, 0.3),
    (2, 1.0, 0.4),
    (2, 1.1, 0.4),
    (4, 0.8, 0.3),  # the collapse test's own config, as a reference
]


def main():
    scene = builders.dam_break_2d(n_target=400)
    h = float(scene.params.h)
    rho0 = float(scene.params.rest_density)
    act0 = np.asarray(scene.state.active)
    x0 = np.asarray(scene.state.pos)[act0][:, 0].max()

    for iters, sor, cap in CONFIGS:
        pp = pbf.make_pbf_params(iters=iters, sor=sor, proj_cap_h=cap * 0.25)
        b = scene.binned_state()
        b = pbf.simulate(scene.params, scene.bgrid, pp, b, 500)
        st = nb.unbin(scene.bgrid, b, scene.state.capacity)
        act = np.asarray(st.active)
        pos = np.asarray(st.pos)[act]
        vel = np.asarray(st.vel)[act]
        rho = np.asarray(st.density)[act]
        spread_h = (pos[:, 0].max() - x0) / h
        print(
            json.dumps(
                {
                    "iters": iters,
                    "sor": sor,
                    "cap": cap,
                    "spread_h": round(float(spread_h), 3),
                    "spread_ok": bool(spread_h > 1.5),
                    "vmax": round(float(np.abs(vel).max()), 3),
                    "rho_q90": round(float(np.quantile(rho, 0.9) / rho0), 4),
                    "rho_max": round(float(rho.max() / rho0), 4),
                    "rebins": int(b.n_rebins),
                    "finite": bool(np.isfinite(pos).all()),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
