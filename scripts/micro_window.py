"""A/B the slab-fold window mode (concat vs split) at 1M on the TPU.

The round-3 profile (PERF.md) showed ~43% of the 1M WCSPH step is window
plumbing: materialising each [blk, cap, 3cap] slab window as a 3-slice
concatenate costs ~42k copy/pad/reshape ops per step, doubled by the
home-tier cond. "split" feeds pair_fn three [blk, cap, cap] cell-column
views instead — pure static slices XLA can fuse into the pair math.

Also verifies the library surface first (4096-particle dam break, 500
steps) so this run doubles as the round's /verify surface-1 check.
"""

import os as _os, sys as _sys  # bare-runnable: repo root on sys.path
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import dataclasses
import time

import jax
import numpy as np

from sph_pie_tpu.kernels import eos
from sph_pie_tpu.neighbors import binned as nb
from sph_pie_tpu.scenes import dam_break_2d, dam_break_3d
from sph_pie_tpu.solvers import pbf, wcsph_binned
from sph_pie_tpu.utils.struct import replace as srep


def sync(x):
    return float(np.asarray(jax.device_get(jax.tree.leaves(x)[0]).ravel()[0]))


print("backend:", jax.default_backend(), flush=True)

# ---- verify surface 1 -------------------------------------------------
scene = dam_break_2d(4096)
b = wcsph_binned.simulate(scene.params, scene.bgrid, scene.binned_state(), 500)
jax.block_until_ready(b.pos)
st = nb.unbin(scene.bgrid, b, scene.state.capacity)
pos = np.asarray(st.pos)[np.asarray(st.active)]
print(
    "verify: overflow:", int(b.overflow), "finite:", bool(np.isfinite(pos).all()),
    "range:", pos.min(0), pos.max(0), flush=True,
)

# ---- WCSPH 1M: forces fold + full step, per mode ----------------------
scene = dam_break_3d(n_target=1_000_000)
b0 = scene.binned_state()

rho = jax.jit(lambda bb: wcsph_binned._density(scene.params, scene.bgrid, bb))(b0)
b2 = srep(b0, density=rho, pressure=eos.tait_pressure(scene.params, rho))

for mode in ("concat", "split"):
    g = dataclasses.replace(scene.bgrid, window_mode=mode)
    frc = jax.jit(lambda bb, g=g: wcsph_binned._forces(scene.params, g, bb))
    acc, xs = frc(b2)
    sync(acc)
    t0 = time.perf_counter()
    for _ in range(5):
        acc, xs = frc(b2)
    sync(acc)
    t_f = (time.perf_counter() - t0) / 5 * 1e3

    stp = jax.jit(lambda bb, g=g: wcsph_binned.step(scene.params, g, bb))
    bb = stp(b0)
    sync(bb.pos)
    t0 = time.perf_counter()
    for _ in range(5):
        bb = stp(bb)
    sync(bb.pos)
    t_s = (time.perf_counter() - t0) / 5 * 1e3
    print(f"wcsph 1M {mode}: forces {t_f:.1f} ms  step {t_s:.1f} ms", flush=True)

# ---- PBF 1M: full step, per mode --------------------------------------
pp = pbf.make_pbf_params(iters=3)
bs = pbf.simulate(scene.params, scene.bgrid, pp, b0, 3)  # settle
sync(bs.pos)
for mode in ("concat", "split"):
    g = dataclasses.replace(scene.bgrid, window_mode=mode)
    stp = jax.jit(lambda bb, g=g: pbf.step(scene.params, g, pp, bb))
    bb = stp(bs)
    sync(bb.pos)
    t0 = time.perf_counter()
    for _ in range(4):
        bb = stp(bb)
    sync(bb.pos)
    t_s = (time.perf_counter() - t0) / 4 * 1e3
    print(f"pbf 1M {mode}: step {t_s:.1f} ms", flush=True)

print("done", flush=True)
