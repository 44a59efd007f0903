"""Hardware micro: owner-gather cost in the PBF step (1M flagship grid).

pbf.step recovers step-start positions and previous-step densities from
compact owner-indexed stashes via per-slot gathers:

    pos0     = pos0c[owner]        # [S, dim] rows from [K, dim]
    rho_prev = rho_prev_c[owner]   # [S] rows from [K]

with S ~ 8.4M slots at the 1M flagship (cells x cap), K ~ 1M. The repo's
measured TPU gather throughput is ~1e8 rows/s for RANDOM rows
(neighbors/binned.py header) — these indices are cell-coherent
(ascending within each cell run), so the real cost could be anywhere
between ~0 and ~100 ms. This micro times exactly the step's gather
shapes, plus the two compact [K]-row stash gathers, plus (for
comparison) the payload-ride alternative's cost: a light rebin with 4
extra payload columns vs without.

Run (TPU, background):
PYTHONPATH=/root/repo:/root/.axon_site python scripts/micro_gather.py [n]
"""


from __future__ import annotations

import os as _os, sys as _sys  # bare-runnable: repo root on sys.path
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from sph_pie_tpu.neighbors import binned as nb
from sph_pie_tpu.scenes import dam_break_3d
from sph_pie_tpu.solvers import pbf


def sync(x):
    return float(np.asarray(jax.device_get(x)))


def timeit(fn, *args, reps=5):
    out = fn(*args)
    sync(jax.tree.leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    sync(jax.tree.leaves(out)[0].ravel()[0])
    return (time.perf_counter() - t0) / reps * 1e3, out


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    scene = dam_break_3d(n_target=n)
    grid, params = scene.bgrid, scene.params
    pp = pbf.flagship_params()

    b = scene.binned_state()
    b = pbf.simulate(params, grid, pp, b, 3)  # settle so owners are real
    sync(b.pos[0, 0])

    S = grid.num_slots
    K = b.slot_of.shape[0]
    print(json.dumps({"S": S, "K": K}), flush=True)

    safe_slot = jnp.clip(b.slot_of, 0, S - 1)
    owner = jnp.clip(b.owner, 0, K - 1)

    # the step's compact stashes ([K] rows from [S])
    t, pos0c = timeit(jax.jit(lambda p, s: p[s]), b.pos, safe_slot)
    print(json.dumps({"op": "stash_pos [K,3]<-**[S,3]**", "ms": round(t, 2)}),
          flush=True)
    t, rhoc = timeit(jax.jit(lambda d, s: d[s]), b.density, safe_slot)
    print(json.dumps({"op": "stash_rho [K]<-[S]", "ms": round(t, 2)}),
          flush=True)

    # the step's slot-space recoveries ([S] rows from [K])
    t, _ = timeit(jax.jit(lambda c, o: c[o]), pos0c, owner)
    print(json.dumps({"op": "gather_pos0 [S,3]<-[K,3]", "ms": round(t, 2)}),
          flush=True)
    t, _ = timeit(jax.jit(lambda c, o: c[o]), rhoc, owner)
    print(json.dumps({"op": "gather_rho [S]<-[K]", "ms": round(t, 2)}),
          flush=True)

    # planar variant: 3 separate [S]<-[K] column gathers (no [*,3] rows)
    cols = [pos0c[:, k] for k in range(3)]

    def planar(o, *cs):
        return tuple(c[o] for c in cs)

    t, _ = timeit(jax.jit(planar), owner, *cols)
    print(json.dumps({"op": "gather_pos0 3x [S]<-[K] planar", "ms": round(t, 2)}),
          flush=True)

    # payload-ride alternative: light rebin with vs without 4 extra columns
    t_light, _ = timeit(jax.jit(lambda bb: nb.rebin(grid, bb, light=True)), b)
    print(json.dumps({"op": "rebin light", "ms": round(t_light, 2)}), flush=True)
    t_full, _ = timeit(jax.jit(lambda bb: nb.rebin(grid, bb)), b)
    print(json.dumps({"op": "rebin full (vel payload = +3 cols)",
                      "ms": round(t_full, 2)}), flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
