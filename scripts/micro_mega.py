"""A/B the mega window mode vs concat at 1M on the TPU (PERF.md lever 1).

mega = one [blk, cap, 27*cap] pair_fn call per block: 864 lanes pad to
896 (3.7% waste) vs the per-slab [blk, cap, 96]->128 (33% waste), and
~10x fewer window-plumbing ops per block. Sweeps block_cells for mega
(the [blk, 32, 896] f32 pair temps hit VMEM limits at large blk).

Interleaves a concat re-baseline so tunnel-state drift (3x cross-process
noise; see memory notes) is visible inside ONE process.
"""

import os as _os, sys as _sys  # bare-runnable: repo root on sys.path
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import dataclasses
import time

import jax
import numpy as np

from sph_pie_tpu.kernels import eos
from sph_pie_tpu.scenes import dam_break_3d
from sph_pie_tpu.solvers import pbf, wcsph_binned
from sph_pie_tpu.utils.struct import replace as srep


def sync(x):
    return float(np.asarray(jax.device_get(jax.tree.leaves(x)[0]).ravel()[0]))


def t_ms(fn, arg, reps=5):
    out = fn(arg)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(arg)
    sync(out)
    return (time.perf_counter() - t0) / reps * 1e3


print("backend:", jax.default_backend(), flush=True)
scene = dam_break_3d(n_target=1_000_000)
b0 = scene.binned_state()
rho = jax.jit(lambda bb: wcsph_binned._density(scene.params, scene.bgrid, bb))(b0)
b2 = srep(b0, density=rho, pressure=eos.tait_pressure(scene.params, rho))

variants = [
    ("concat", 256),
    ("mega", 256),
    ("mega", 128),
    ("mega", 64),
    ("concat", 256),  # re-baseline: detects tunnel drift
]
best = None
for mode, blk in variants:
    g = dataclasses.replace(scene.bgrid, window_mode=mode, block_cells=blk)
    frc = jax.jit(lambda bb, g=g: wcsph_binned._forces(scene.params, g, bb)[0])
    t_f = t_ms(frc, b2)
    print(f"forces 1M {mode} blk={blk}: {t_f:.1f} ms", flush=True)
    if mode == "mega" and (best is None or t_f < best[1]):
        best = ((mode, blk), t_f)

(bm, bblk), _ = best
for mode, blk in (("concat", 256), (bm, bblk)):
    g = dataclasses.replace(scene.bgrid, window_mode=mode, block_cells=blk)
    stp = jax.jit(lambda bb, g=g: wcsph_binned.step(scene.params, g, bb))
    t_s = t_ms(lambda bb, s=stp: s(bb).pos, b0)
    print(f"step 1M {mode} blk={blk}: {t_s:.1f} ms", flush=True)

pp = pbf.make_pbf_params(iters=3)
bs = pbf.simulate(scene.params, scene.bgrid, pp, b0, 3)
sync(bs.pos)
for mode, blk in (("concat", 256), (bm, bblk)):
    g = dataclasses.replace(scene.bgrid, window_mode=mode, block_cells=blk)
    stp = jax.jit(lambda bb, g=g: pbf.step(scene.params, g, pp, bb))
    t_s = t_ms(lambda bb, s=stp: s(bb).pos, bs, reps=4)
    print(f"pbf 1M {mode} blk={blk}: {t_s:.1f} ms", flush=True)

print("done", flush=True)
