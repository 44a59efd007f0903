"""Hardware microbench: adaptive per-block home rows vs static tier fold.

Run on the real TPU:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/micro_adaptive.py [N] [steps]

Times _density/_forces on the initial state AND a settled late-run state
(after `steps` real steps — occupancy distribution differs a lot).
"""

import os as _os, sys as _sys  # bare-runnable: repo root on sys.path
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import dataclasses
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


def phase_times(tag, params, g, b):
    dens = jax.jit(lambda bb: wcsph_binned._density(params, g, bb))
    t_d, rho = timeit(dens, b)
    b2 = replace(b, density=rho, pressure=eos.tait_pressure(params, rho))
    frc = jax.jit(lambda bb: wcsph_binned._forces(params, g, bb))
    t_f, _ = timeit(frc, b2)
    print(
        json.dumps(
            {"cfg": tag, "density_ms": round(t_d, 2), "forces_ms": round(t_f, 2)}
        ),
        flush=True,
    )
    return rho


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 400
    scene = dam_break_3d(n_target=n)
    g = scene.bgrid
    cfgs = {
        "static_tier": g,
        "adaptive8": dataclasses.replace(g, adaptive_rows=8, home_tier=0),
    }
    b0 = scene.binned_state()
    print(
        json.dumps({"n": n, "cap": g.cap, "tier": g.home_tier, "blk": g.block_cells}),
        flush=True,
    )
    for tag, gg in cfgs.items():
        phase_times(f"{tag}_t0", scene.params, gg, b0)

    b = wcsph_binned.simulate(scene.params, g, b0, steps)
    sync(b.pos[0, 0])
    for tag, gg in cfgs.items():
        phase_times(f"{tag}_t{steps}", scene.params, gg, b)

    # full step rate with each config (50 steps, late state)
    for tag, gg in cfgs.items():
        sim = jax.jit(
            lambda bb, k, gg=gg: wcsph_binned.simulate(scene.params, gg, bb, k)
        )
        bb = sim(b, 2)
        sync(bb.pos[0, 0])
        t0 = time.perf_counter()
        bb = sim(b, 50)
        sync(bb.pos[0, 0])
        ms = (time.perf_counter() - t0) * 1e3 / 50
        print(json.dumps({"cfg": f"{tag}_step", "ms_per_step": round(ms, 2)}), flush=True)


if __name__ == "__main__":
    main()
