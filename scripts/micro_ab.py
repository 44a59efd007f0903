"""Noise-robust A/B: window_mode + block size at 1M on the TPU.

The axon tunnel's throughput drifts up to 3x WITHIN a process (memory
notes; observed 2026-08-17: the same concat forces fold measured 1936
then 875 ms in one run). Mean-of-5 timings are therefore useless for
close calls. This harness interleaves all variants round-robin for
several rounds and scores each variant by its MIN single-rep time —
tunnel stalls only ever ADD time, so the min is the least-noise
estimate of true cost.

Usage: python scripts/micro_ab.py [wcsph|pbf|both]
"""

import os as _os, sys as _sys  # bare-runnable: repo root on sys.path
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import dataclasses
import sys
import time

import jax
import numpy as np

from sph_pie_tpu.kernels import eos
from sph_pie_tpu.scenes import dam_break_3d
from sph_pie_tpu.solvers import pbf, wcsph_binned
from sph_pie_tpu.utils.struct import replace as srep


def sync(x):
    return float(np.asarray(jax.device_get(jax.tree.leaves(x)[0]).ravel()[0]))


def rep_ms(fn, arg):
    t0 = time.perf_counter()
    sync(fn(arg))
    return (time.perf_counter() - t0) * 1e3


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    print("backend:", jax.default_backend(), flush=True)
    scene = dam_break_3d(n_target=1_000_000)
    b0 = scene.binned_state()
    rho = jax.jit(
        lambda bb: wcsph_binned._density(scene.params, scene.bgrid, bb)
    )(b0)
    b2 = srep(b0, density=rho, pressure=eos.tait_pressure(scene.params, rho))

    variants = [("concat", 256), ("mega", 256), ("mega", 128)]

    if which in ("wcsph", "both"):
        steps = {}
        for mode, blk in variants:
            g = dataclasses.replace(
                scene.bgrid, window_mode=mode, block_cells=blk
            )
            steps[(mode, blk)] = jax.jit(
                lambda bb, g=g: wcsph_binned.step(scene.params, g, bb)
            )
        for key, fn in steps.items():
            sync(fn(b2).pos)  # compile
        mins = {k: float("inf") for k in steps}
        for rnd in range(4):
            for key, fn in steps.items():
                t = rep_ms(lambda bb, f=fn: f(bb).pos, b2)
                mins[key] = min(mins[key], t)
                print(f"wcsph step {key[0]} blk={key[1]} r{rnd}: {t:.1f} ms",
                      flush=True)
        for key, t in mins.items():
            print(f"WCSPH-MIN {key[0]} blk={key[1]}: {t:.1f} ms", flush=True)

    if which in ("pbf", "both"):
        pp = pbf.make_pbf_params(iters=3)
        bs = pbf.simulate(scene.params, scene.bgrid, pp, b0, 5)
        sync(bs.pos)
        steps = {}
        for mode, blk in variants:
            g = dataclasses.replace(
                scene.bgrid, window_mode=mode, block_cells=blk
            )
            steps[(mode, blk)] = jax.jit(
                lambda bb, g=g: pbf.step(scene.params, g, pp, bb)
            )
        for key, fn in steps.items():
            sync(fn(bs).pos)
        mins = {k: float("inf") for k in steps}
        for rnd in range(4):
            for key, fn in steps.items():
                t = rep_ms(lambda bb, f=fn: f(bb).pos, bs)
                mins[key] = min(mins[key], t)
                print(f"pbf step {key[0]} blk={key[1]} r{rnd}: {t:.1f} ms",
                      flush=True)
        for key, t in mins.items():
            print(f"PBF-MIN {key[0]} blk={key[1]}: {t:.1f} ms", flush=True)

    print("done", flush=True)


if __name__ == "__main__":
    main()
