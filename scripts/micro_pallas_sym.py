"""Hardware microbench: the symmetric Pallas DENSITY kernel vs the XLA fold.

Run on the real TPU:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/micro_pallas_sym.py [N]
"""

import os as _os, sys as _sys  # bare-runnable: repo root on sys.path
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import sys
import time

import jax
import numpy as np

from sph_pie_tpu.neighbors import pallas_sym
from sph_pie_tpu.scenes import dam_break_3d
from sph_pie_tpu.solvers import wcsph_binned


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
    g = scene.bgrid
    print(json.dumps({"n": n, "cap": g.cap, "cells": g.num_cells}), flush=True)
    b = scene.binned_state()

    fold = jax.jit(lambda bb: wcsph_binned._density(scene.params, g, bb))
    t_fold, rho_fold = timeit(fold, b)
    print(json.dumps({"density_fold_ms": round(t_fold, 2)}), flush=True)

    pal = jax.jit(lambda bb: pallas_sym.density_sym(scene.params, g, bb))
    t_pal, rho_pal = timeit(pal, b)
    print(
        json.dumps(
            {
                "density_sym_ms": round(t_pal, 2),
                "rel_err": relerr(rho_fold, rho_pal, b.valid),
                "speedup": round(t_fold / t_pal, 2),
            }
        ),
        flush=True,
    )

    # (The forces_sym arm was trimmed with the kernel in round 4 —
    # ROADMAP ledger item 18; see git history for the harness.)


if __name__ == "__main__":
    main()
