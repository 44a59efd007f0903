"""Skin-fraction sweep at 1M: pair volume vs rebin frequency.

Pair-phase cost scales with cell volume (1+sf)^3; rebin cost scales with
trigger frequency ~ v*dt/(sf*h/2). This sweeps the tradeoff with the FULL
step loop (including lazy rebins) on the real chip.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/sweep_skin.py
"""

import os as _os, sys as _sys  # bare-runnable: repo root on sys.path
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import sys
import time

import jax
import numpy as np

from sph_pie_tpu.scenes import dam_break_3d
from sph_pie_tpu.solvers import wcsph_binned


def sync(x):
    return float(np.asarray(jax.device_get(x)))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    for sf in (0.25, 0.18, 0.12, 0.08):
        scene = dam_break_3d(n_target=n, skin_frac=sf)
        g = scene.bgrid
        b = scene.binned_state()
        sim = jax.jit(
            lambda bb, k, g=g, p=scene.params: wcsph_binned.simulate(p, g, bb, k)
        )
        b = sim(b, 50)  # warm into a moving state + compile
        sync(b.pos[0, 0])
        r0 = int(np.asarray(b.n_rebins))
        t0 = time.perf_counter()
        b = sim(b, 150)
        sync(b.pos[0, 0])
        ms = (time.perf_counter() - t0) * 1e3 / 150
        print(
            json.dumps(
                {
                    "skin_frac": sf,
                    "cells": g.num_cells,
                    "cap": g.cap,
                    "ms_per_step": round(ms, 2),
                    "rebins_per_100_steps": round(
                        (int(np.asarray(b.n_rebins)) - r0) / 1.5, 1
                    ),
                    "overflow": int(np.asarray(b.overflow)),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
