"""Hardware decomposition of the PBF flagship step residual (VERDICT r03 #5).

PERF.md's attribution at the 1M flagship leaves a ~75 ms residual
(O(S) epilogue + owner gathers + drift checks) that was itemised but
never isolated. This measures it by SUBTRACTION with monkeypatched step
variants — all arms jitted fresh (pbf.step.__wrapped__ under new
lambdas, so each arm traces against the currently-patched modules) and
interleaved in one process:

  full      the real flagship step (pbf.simulate)
  norebin   maybe_rebin -> identity: no rebins, no drift checks.
            full - norebin = rebin + drift-check cost per step.
  scaffold  norebin + slab_fold -> init (pair math deleted): the pure
            O(S) predict/cap/clip/epilogue scaffold + dispatch.
            norebin - scaffold = pure fold cost; cross-checked against
            the standalone fold arms below.
  lambda/dx/final   standalone jitted folds at the flagship state.
  rebin     standalone nb.rebin(carry_density=True) (the ride scheme's
            full rebin).
  check     maybe_rebin on a state with travel > skin/2 but zero true
            drift — the cond-true/check-false path (one O(S) max pass +
            the lax.cond plumbing), the thing that fires ~2-4x/step.

Timing-only caveat: norebin/scaffold arms produce physically wrong
trajectories (stale pair lists / zero folds) — wall-clock is what they
are for; parity is covered by the test suite.

Run (TPU, background):
PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/micro_pbf_resid.py [n] [reps]
"""


from __future__ import annotations

import os as _os, sys as _sys  # bare-runnable: repo root on sys.path
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import sys
import time

import jax
import numpy as np
from jax import lax

from sph_pie_tpu.neighbors import binned as nb
from sph_pie_tpu.scenes import dam_break_3d
from sph_pie_tpu.solvers import pbf, wcsph_binned
from sph_pie_tpu.utils.struct import replace


def sync(x):
    return float(np.asarray(jax.device_get(x)))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    steps = 10
    scene = dam_break_3d(n_target=n)
    params, grid = scene.params, scene.bgrid
    pp = pbf.flagship_params()
    print(
        json.dumps(
            {"n": n, "cap": grid.cap, "cells": grid.num_cells,
             "slots": grid.num_slots}
        ),
        flush=True,
    )

    b = scene.binned_state()
    b = pbf.simulate(params, grid, pp, b, 5)
    sync(b.travel)
    r0 = int(np.asarray(b.n_rebins))

    step_raw = pbf.step.__wrapped__
    real_rebin = pbf.maybe_rebin
    real_fold = nb.slab_fold

    def roll_of(step_fn):
        def roll(bb, k):
            return lax.fori_loop(
                0, k, lambda _, s: step_fn(params, grid, pp, s), bb
            )

        return jax.jit(roll, static_argnames=("k",))

    # full (tracing now, unpatched)
    arm_full = roll_of(step_raw)

    # norebin (trace with maybe_rebin patched; trace at k=steps — a later
    # first call with a different static k would RE-trace after the patch
    # is reverted)
    pbf.maybe_rebin = lambda g, bb, light=False, carry_density=False: bb
    arm_norebin = roll_of(step_raw)
    arm_norebin(b, steps)

    # scaffold (additionally delete the pair math)
    nb.slab_fold = (
        lambda grid, fields, pair, init, halo=None, local_cells=None: init
    )
    arm_scaffold = roll_of(step_raw)
    arm_scaffold(b, steps)
    pbf.maybe_rebin = real_rebin
    nb.slab_fold = real_fold

    # standalone phases at the flagship state
    fields = {**wcsph_binned._planar("p", b.pos), "mass": b.mass}
    lam, _ = pbf._lambda_fold(params, pp, grid, fields)
    del fields
    arm_lambda = jax.jit(
        lambda bb: pbf._lambda_fold(
            params, pp, grid,
            {**wcsph_binned._planar("p", bb.pos), "mass": bb.mass},
        )[0]
    )
    arm_dx = jax.jit(
        lambda bb, ll: pbf._dx_fold(
            params, pp, grid,
            {**wcsph_binned._planar("p", bb.pos), "mass": bb.mass, "lam": ll},
        )
    )
    arm_final = jax.jit(
        lambda bb: pbf._density_xsph_fold(
            params, grid, bb.pos, bb.vel, bb.mass, bb.mass / 1000.0
        )[0]
    )
    arm_rebin = jax.jit(lambda bb: nb.rebin(grid, bb, carry_density=True))
    # check arm: travel above threshold, bin_pos == pos (zero true drift)
    b_chk = replace(
        b,
        bin_pos=b.pos,
        travel=np.asarray(grid.skin, b.pos.dtype) * 10.0,
    )
    arm_check = jax.jit(lambda bb: pbf.maybe_rebin(grid, bb))

    times: dict[str, list] = {}

    def timed(label, fn, sync_pick, inner=1):
        out = fn()
        sync(sync_pick(out))
        t0 = time.perf_counter()
        for _ in range(inner):
            out = fn()
        sync(sync_pick(out))
        ms = (time.perf_counter() - t0) / inner * 1e3
        times.setdefault(label, []).append(ms)
        return ms

    for r in range(reps):
        row = {}
        row["full"] = timed("full", lambda: arm_full(b, steps),
                            lambda o: o.travel) / steps
        times["full"][-1] = row["full"]
        row["norebin"] = timed("norebin", lambda: arm_norebin(b, steps),
                               lambda o: o.travel) / steps
        times["norebin"][-1] = row["norebin"]
        row["scaffold"] = timed("scaffold", lambda: arm_scaffold(b, steps),
                                lambda o: o.travel) / steps
        times["scaffold"][-1] = row["scaffold"]
        row["lambda"] = timed("lambda", lambda: arm_lambda(b),
                              lambda o: o.ravel()[0], inner=3)
        row["dx"] = timed("dx", lambda: arm_dx(b, lam),
                          lambda o: o.ravel()[0], inner=3)
        row["final"] = timed("final", lambda: arm_final(b),
                             lambda o: o.ravel()[0], inner=3)
        row["rebin"] = timed("rebin", lambda: arm_rebin(b),
                             lambda o: o.travel, inner=3)
        row["check"] = timed("check", lambda: arm_check(b_chk),
                             lambda o: o.travel, inner=3)
        print(
            json.dumps({"rep": r, **{k: round(v, 2) for k, v in row.items()}}),
            flush=True,
        )

    bf = arm_full(b, steps)
    rebins = (int(np.asarray(bf.n_rebins)) - r0) / steps
    mins = {k: round(min(v), 2) for k, v in times.items()}
    mins["rebins_per_step"] = round(rebins, 2)
    mins["rebin_check_per_step"] = round(mins["full"] - mins["norebin"], 2)
    mins["fold_cost_per_step"] = round(mins["norebin"] - mins["scaffold"], 2)
    mins["fold_sum_standalone"] = round(
        2 * (mins["lambda"] + mins["dx"]) + mins["final"], 2
    )
    print(json.dumps({"MIN": mins}), flush=True)


if __name__ == "__main__":
    main()
