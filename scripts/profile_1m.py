"""Profile the 1M 3D dam break: occupancy stats + phase timings.

Run on the real TPU:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_1m.py [N]

Outputs JSON lines with, per 50-step chunk: wall ms/step, cell-occupancy
max/p99/mean-over-occupied, occupied cell fraction, occupied 256-cell
block fraction. Plus one-off density/forces/rebin phase timings.
"""

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
from sph_pie_tpu.solvers import wcsph_binned


def sync(x):
    return float(np.asarray(jax.device_get(x)))


def occupancy_stats(grid, b):
    counts = jnp.sum(
        b.valid.reshape(grid.num_cells, grid.cap).astype(jnp.int32), axis=1
    )
    blk = grid.block_cells or grid.num_cells
    nblk = -(-grid.num_cells // blk)
    pad = nblk * blk - grid.num_cells
    bc = jnp.concatenate([counts, jnp.zeros((pad,), jnp.int32)]).reshape(nblk, blk)
    block_occ = jnp.sum(bc, axis=1) > 0
    c = np.asarray(counts)
    occ = c[c > 0]
    bmax = np.asarray(jnp.max(bc, axis=1))
    occupied_blocks = bmax > 0
    return {
        "max_occ": int(occ.max()) if occ.size else 0,
        "p99_occ": float(np.percentile(occ, 99)) if occ.size else 0,
        "p999_occ": float(np.percentile(occ, 99.9)) if occ.size else 0,
        "mean_occ": float(occ.mean()) if occ.size else 0,
        "occupied_cells_frac": float((c > 0).mean()),
        "occupied_blocks_frac": float(np.asarray(block_occ).mean()),
        # tier decision data: of occupied blocks, how many have a cell
        # above each candidate tier boundary?
        "blocks_over_16": float((bmax > 16).sum() / max(occupied_blocks.sum(), 1)),
        "blocks_over_24": float((bmax > 24).sum() / max(occupied_blocks.sum(), 1)),
        "blocks_over_28": float((bmax > 28).sum() / max(occupied_blocks.sum(), 1)),
        "overflow": int(np.asarray(b.overflow)),
    }


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    scene = dam_break_3d(n_target=n)
    g = scene.bgrid
    print(
        json.dumps(
            {
                "n": scene.state.capacity,
                "dims": g.dims,
                "num_cells": g.num_cells,
                "cap": g.cap,
                "block_cells": g.block_cells,
                "num_slots": g.num_slots,
                "cell_size": g.cell_size,
                "h": float(scene.params.h),
            }
        ),
        flush=True,
    )
    b = scene.binned_state()

    # phase timings on the initial state
    dens = jax.jit(lambda bb: wcsph_binned._density(scene.params, g, bb))
    rho = dens(b)
    sync(rho[0])
    t0 = time.perf_counter()
    for _ in range(3):
        rho = dens(b)
    sync(rho[0])
    t_dens = (time.perf_counter() - t0) / 3

    from sph_pie_tpu.kernels import eos
    from sph_pie_tpu.utils.struct import replace as srep

    b2 = srep(b, density=rho, pressure=eos.tait_pressure(scene.params, rho))
    frc = jax.jit(lambda bb: wcsph_binned._forces(scene.params, g, bb))
    acc, xs = frc(b2)
    sync(acc[0, 0])
    t0 = time.perf_counter()
    for _ in range(3):
        acc, xs = frc(b2)
    sync(acc[0, 0])
    t_frc = (time.perf_counter() - t0) / 3

    rb = jax.jit(lambda bb: nb.rebin(g, bb))
    o = rb(b)
    sync(o.pos[0, 0])
    t0 = time.perf_counter()
    for _ in range(3):
        o = rb(b)
    sync(o.pos[0, 0])
    t_rebin = (time.perf_counter() - t0) / 3

    print(
        json.dumps(
            {
                "density_ms": round(t_dens * 1e3, 2),
                "forces_ms": round(t_frc * 1e3, 2),
                "rebin_ms": round(t_rebin * 1e3, 2),
            }
        ),
        flush=True,
    )

    # rolling run: occupancy + ms/step every 50 steps
    sim = jax.jit(
        lambda bb, k: wcsph_binned.simulate(scene.params, g, bb, k),
        static_argnums=(),
    )
    b = sim(b, 1)  # compile
    sync(b.pos[0, 0])
    for chunk in range(20):
        t0 = time.perf_counter()
        b = sim(b, 50)
        sync(b.pos[0, 0])
        dt_ms = (time.perf_counter() - t0) * 1e3 / 50
        stats = occupancy_stats(g, b)
        stats.update({"step": (chunk + 1) * 50, "ms_per_step": round(dt_ms, 2)})
        print(json.dumps(stats), flush=True)


if __name__ == "__main__":
    main()
