"""Sweep fold block size at 1M (cap-40 tier, one-sided fold) on the TPU.

Hypothesis: [blk, cap, 3cap] pair temps at blk=256 are ~5 MB each, forcing
XLA to split fusions and spill temps to HBM; smaller blocks may fuse whole.
"""

import os as _os, sys as _sys  # bare-runnable: repo root on sys.path
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import sys
import time
import dataclasses

import jax
import numpy as np

from sph_pie_tpu.kernels import eos
from sph_pie_tpu.scenes import dam_break_3d
from sph_pie_tpu.solvers import wcsph_binned
from sph_pie_tpu.utils.struct import replace as srep


def sync(x):
    return float(np.asarray(jax.device_get(jax.tree.leaves(x)[0]).ravel()[0]))


scene = dam_break_3d(n_target=1_000_000)
b0 = scene.binned_state()
rho0 = None

for blk in (32, 64, 128, 256, 512):
    g = dataclasses.replace(scene.bgrid, block_cells=blk, symmetric_fold=False)
    dens = jax.jit(lambda bb, g=g: wcsph_binned._density(scene.params, g, bb))
    rho = dens(b0)
    sync(rho)
    t0 = time.perf_counter()
    for _ in range(3):
        rho = dens(b0)
    sync(rho)
    t_d = (time.perf_counter() - t0) / 3 * 1e3

    b2 = srep(b0, density=rho, pressure=eos.tait_pressure(scene.params, rho))
    frc = jax.jit(lambda bb, g=g: wcsph_binned._forces(scene.params, g, bb))
    acc, xs = frc(b2)
    sync(acc)
    t0 = time.perf_counter()
    for _ in range(3):
        acc, xs = frc(b2)
    sync(acc)
    t_f = (time.perf_counter() - t0) / 3 * 1e3
    print(f"blk={blk}: density {t_d:.1f} ms, forces {t_f:.1f} ms", flush=True)
print("done", flush=True)

# (penetration probe removed: margin_cells fixed the overflow root cause;
# overflow is asserted 0 in the bench and tests)
