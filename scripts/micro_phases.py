"""Phase timings (density / forces / full step) at N on the real chip.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/micro_phases.py [N]
"""

import os as _os, sys as _sys  # bare-runnable: repo root on sys.path
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import sys
import time

import jax
import numpy as np

from sph_pie_tpu.kernels import eos
from sph_pie_tpu.scenes import dam_break_3d
from sph_pie_tpu.solvers import wcsph_binned
from sph_pie_tpu.utils.struct import replace


def sync(x):
    return float(np.asarray(jax.device_get(x)))


def timeit(fn, *args, reps=5):
    out = fn(*args)
    sync(out[0] if not isinstance(out, tuple) else out[0][0, 0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    sync(out[0] if not isinstance(out, tuple) else out[0][0, 0])
    return (time.perf_counter() - t0) / reps * 1e3, out


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    scene = dam_break_3d(n_target=n)
    g = scene.bgrid
    b = scene.binned_state()
    dens = jax.jit(lambda bb: wcsph_binned._density(scene.params, g, bb))
    t_d, rho = timeit(dens, b)
    b2 = replace(b, density=rho, pressure=eos.tait_pressure(scene.params, rho))
    frc = jax.jit(lambda bb: wcsph_binned._forces(scene.params, g, bb))
    t_f, _ = timeit(frc, b2)
    print(
        json.dumps({"n": n, "density_ms": round(t_d, 2), "forces_ms": round(t_f, 2)}),
        flush=True,
    )
    sim = jax.jit(lambda bb, k: wcsph_binned.simulate(scene.params, g, bb, k))
    bb = sim(b, 52)
    sync(bb.pos[0, 0])
    t0 = time.perf_counter()
    bb = sim(bb, 100)
    sync(bb.pos[0, 0])
    print(
        json.dumps(
            {
                "step_ms": round((time.perf_counter() - t0) * 1e3 / 100, 2),
                "overflow": int(np.asarray(bb.overflow)),
                "rebins": int(np.asarray(bb.n_rebins)),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
