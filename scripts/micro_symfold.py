"""Hardware microbench: XLA symmetric fold v2 (scan-ys deposits) vs the
one-sided fold, phases + full step at 1M.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/micro_symfold.py [N]
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


def relerr(a, b, valid):
    a = np.asarray(a)[np.asarray(valid)]
    b = np.asarray(b)[np.asarray(valid)]
    scale = max(1.0e-30, float(np.abs(a).max()))
    return float(np.abs(a - b).max() / scale)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    scene = dam_break_3d(n_target=n)
    g1 = scene.bgrid
    gs = dataclasses.replace(g1, symmetric_fold=True)
    print(json.dumps({"n": n, "cap": g1.cap, "tier": g1.home_tier}), flush=True)
    b = scene.binned_state()

    fold = jax.jit(lambda bb: wcsph_binned._density(scene.params, g1, bb))
    t_fold, rho_f = timeit(fold, b)
    sym = jax.jit(lambda bb: wcsph_binned._density(scene.params, gs, bb))
    t_sym, rho_s = timeit(sym, b)
    print(
        json.dumps(
            {
                "density_fold_ms": round(t_fold, 2),
                "density_symfold_ms": round(t_sym, 2),
                "rel_err": relerr(rho_f, rho_s, b.valid),
                "speedup": round(t_fold / t_sym, 2),
            }
        ),
        flush=True,
    )

    b2 = replace(b, density=rho_f, pressure=eos.tait_pressure(scene.params, rho_f))
    ff = jax.jit(lambda bb: wcsph_binned._forces(scene.params, g1, bb))
    t_ff, (acc_f, _) = timeit(ff, b2)
    fs = jax.jit(lambda bb: wcsph_binned._forces(scene.params, gs, bb))
    t_fs, (acc_s, _) = timeit(fs, b2)
    print(
        json.dumps(
            {
                "forces_fold_ms": round(t_ff, 2),
                "forces_symfold_ms": round(t_fs, 2),
                "rel_err": relerr(acc_f, acc_s, b.valid),
                "speedup": round(t_ff / t_fs, 2),
            }
        ),
        flush=True,
    )

    # full step rate, late-run state (the bench regime)
    for tag, gg in (("fold", g1), ("symfold", gs)):
        sim = jax.jit(
            lambda bb, k, gg=gg: wcsph_binned.simulate(scene.params, gg, bb, k)
        )
        bb = sim(b, 52)
        sync(bb.pos[0, 0])
        t0 = time.perf_counter()
        bb = sim(bb, 100)
        sync(bb.pos[0, 0])
        ms = (time.perf_counter() - t0) * 1e3 / 100
        print(
            json.dumps({"cfg": tag, "step_ms": round(ms, 2),
                        "overflow": int(np.asarray(bb.overflow))}),
            flush=True,
        )


if __name__ == "__main__":
    main()
