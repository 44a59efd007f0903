"""Benchmark entry point (driver contract: prints ONE SHORT JSON line).

Flagship metric per BASELINE.json: particle-steps/sec on the 3D dam break
at 1M particles, single chip. vs_baseline is the fraction of the BASELINE
north-star target (1e9 particle-steps/sec on a v5e-8); the reference repo
itself publishes no numbers (BASELINE.md).

Output contract (VERDICT r03 #1): the driver captures only a ~2000-char
tail of stdout, and the round-3 single line with full per-config detail
outgrew it — the official metric never parsed (BENCH_r03.json
"parsed": null). So stdout now carries ONE short headline JSON line
(metric/value/unit/vs_baseline + a compact ms-per-step summary, well
under 2000 chars) and the full per-config detail is written to
``BENCH_DETAIL.json`` next to this file instead of stdout.

Hygiene (VERDICT r02 #5): every timed window is >= 20 steps and repeated
>= 3 times; rows report the MEDIAN ms/step plus all reps, the rebin count
over the timed window, and (for the flagship) standalone per-phase times.
"""

from __future__ import annotations

import json
import statistics
import sys
import time

NORTH_STAR = 1.0e9  # particle-steps/sec, v5e-8 (BASELINE.json north_star)


def _enable_compile_cache():
    """Persistent XLA compilation cache: the 1M-scene compiles cost ~2 min
    cold; cached reruns (driver invokes bench every round) skip them."""
    import os

    import jax

    d = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    os.makedirs(d, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", d)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax: cache is best-effort


def _sync(b):
    """Force full completion via a host readback. NOTE: on the tunnelled
    axon backend, jax.block_until_ready can return before the device work
    is done (observed: a 500-step roll "completing" in 3 ms); a scalar
    transfer is the only reliable fence."""
    import numpy as np

    return float(np.asarray(b.travel))


def _timed_reps(roll, b, steps: int, reps: int):
    """Run ``roll(b, steps)`` ``reps`` times; returns (ms/step list, final
    state, rebins over the whole timed span)."""
    import numpy as np

    r0 = int(np.asarray(b.n_rebins))
    walls = []
    for _ in range(reps):
        t0 = time.time()
        b = roll(b, steps)
        _sync(b)
        walls.append((time.time() - t0) / steps * 1e3)
    rebins = int(np.asarray(b.n_rebins)) - r0
    return walls, b, rebins


def _row(n, steps, reps_ms, rebins, reps, extra=None):
    med = statistics.median(reps_ms)
    out = {
        "n_particles": n,
        "steps_per_rep": steps,
        "reps": reps,
        "ms_per_step": round(med, 4),
        "ms_per_step_reps": [round(x, 4) for x in reps_ms],
        "particle_steps_per_sec": n / (med / 1e3),
        "steps_per_sec": 1e3 / med,
        "rebins_per_step": round(rebins / (steps * reps), 4),
    }
    if extra:
        out.update(extra)
    return out


def _measure(scene, warm_steps: int, steps: int, reps: int = 3, phases=False):
    from sph_pie_tpu.solvers import wcsph_binned

    b = scene.binned_state()
    b = wcsph_binned.simulate(scene.params, scene.bgrid, b, warm_steps)
    _sync(b)

    def roll(bb, k):
        return wcsph_binned.simulate(scene.params, scene.bgrid, bb, k)

    walls, b, rebins = _timed_reps(roll, b, steps, reps)
    extra = {"overflow": int(b.overflow)}
    if phases:
        extra["phases_ms"] = _wcsph_phases(scene, b)
    n = int(scene.state.n_active())
    return _row(n, steps, walls, rebins, reps, extra)


def _wcsph_phases(scene, b):
    """Standalone density / forces / rebin timings on the CURRENT state."""
    import jax

    from sph_pie_tpu.kernels import eos
    from sph_pie_tpu.neighbors import binned as nb
    from sph_pie_tpu.solvers import wcsph_binned
    from sph_pie_tpu.utils.struct import replace

    params, grid = scene.params, scene.bgrid
    rho = wcsph_binned._density(params, grid, b)
    b = replace(b, density=rho, pressure=eos.tait_pressure(params, rho))

    def t(fn, *args, reps=3):
        out = fn(*args)
        _sync_leaf(out)
        t0 = time.time()
        for _ in range(reps):
            out = fn(*args)
        _sync_leaf(out)
        return round((time.time() - t0) / reps * 1e3, 2)

    dens = jax.jit(lambda bb: wcsph_binned._density(params, grid, bb))
    forc = jax.jit(lambda bb: wcsph_binned._forces(params, grid, bb))
    reb = jax.jit(lambda bb: nb.rebin(grid, bb))
    return {
        "density": t(dens, b),
        "forces": t(forc, b),
        "rebin": t(reb, b),
    }


def _sync_leaf(out):
    import jax
    import numpy as np

    leaf = jax.tree.leaves(out)[0]
    return float(np.asarray(leaf.ravel()[0]))


def _measure_emitter(n_steps=500):
    """BASELINE config #2: emitter + obstacle scene via the epoch loop."""
    import numpy as np

    from sph_pie_tpu.scenes import emitter_2d
    from sph_pie_tpu.solvers import run as run_lib

    scene = emitter_2d(4096)
    st, _ = run_lib.run_scene(scene, 100)  # warm/compile
    walls = []
    for _ in range(3):
        t0 = time.time()
        st, overflow = run_lib.run_scene(scene, n_steps)
        # Scalar readback INSIDE the timed region: through the axon
        # tunnel block_until_ready can return before device completion
        # (see _sync), and without a fence the wall time is dispatch-only
        # (observed: 500 steps "in" 1.1 ms).
        float(np.asarray(st.pos).ravel()[0])
        walls.append(time.time() - t0)
    n_final = int(np.asarray(st.active).sum())
    med = statistics.median(walls)
    return {
        "steps": n_steps,
        "reps": 3,
        "wall_s": round(med, 4),
        "wall_s_reps": [round(w, 4) for w in walls],
        "steps_per_sec": n_steps / med,
        "particles_emitted": n_final,
        "overflow": int(overflow),
    }


def _measure_pbf(n=100_000, steps=20, reps=3, render=False):
    """BASELINE config #4: incompressible PBF solver; with render=True the
    on-device splat render runs INSIDE the timed loop every step (the
    config reads "PBF/PCISPH 1M w/ on-device splat render")."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    from sph_pie_tpu.render import splat as splat_lib
    from sph_pie_tpu.scenes import dam_break_3d
    from sph_pie_tpu.solvers import pbf

    scene = dam_break_3d(n)
    pp = pbf.flagship_params()
    grid = scene.bgrid

    if render:

        @jax.jit
        def roll_fn(b, k):
            def body(_, carry):
                bb, checksum = carry
                bb = pbf.step(scene.params, grid, pp, bb)
                frame = splat_lib.render_binned_u8(
                    grid, bb, (256, 256), axis=1, gain=50.0
                )
                # consume the frame so the render cannot be dead-code'd
                return bb, checksum + jnp.sum(frame.astype(jnp.uint32))

            return lax.fori_loop(
                0,
                jnp.asarray(k, jnp.int32),
                body,
                (b, jnp.zeros((), jnp.uint32)),
            )

        def roll(b, k):
            b, checksum = roll_fn(b, k)
            return b
    else:

        def roll(b, k):
            return pbf.simulate(scene.params, grid, pp, b, k)

    b = scene.binned_state()
    b = roll(b, 2)
    _sync(b)
    walls, b, rebins = _timed_reps(roll, b, steps, reps)
    n_act = int(scene.state.n_active())
    return _row(
        n_act,
        steps,
        walls,
        rebins,
        reps,
        {"render_in_loop": bool(render), "overflow": int(b.overflow)},
    )


def main() -> int:
    _enable_compile_cache()
    from sph_pie_tpu.scenes import dam_break_2d, dam_break_3d

    extra = {}
    # Secondary: 2D 4k demo (fast, always runs). Settle 2500 steps first:
    # the r03 3-rep spread was 2.2x because a 200-step warm leaves the
    # column mid-collapse, so each 1000-step rep timed a different
    # dynamical regime (rebin rate falls as the flow settles); timing the
    # quasi-steady slosh + 5 reps brings the spread under 1.2x
    # (VERDICT r03 #7).
    extra["dam_break_2d_4k"] = _measure(dam_break_2d(4096), 2500, 1000, reps=5)
    for key, fn in (
        ("emitter_2d_4k", _measure_emitter),
        # BASELINE config #3: 3D dam break at 100k with the cohesion /
        # surface-tension term (dam_break_3d defaults surface_tension=0.25)
        ("dam_break_3d_100k_st", lambda: _measure(dam_break_3d(100_000), 5, 20)),
        ("pbf_3d_100k", _measure_pbf),
        # BASELINE config #4 as written: PBF at 1M, with and without the
        # on-device splat render inside the timed loop
        ("pbf_3d_1m", lambda: _measure_pbf(1_000_000, 20, 3, render=False)),
        (
            "pbf_3d_1m_render",
            lambda: _measure_pbf(1_000_000, 20, 3, render=True),
        ),
    ):
        try:
            extra[key] = fn()
        except Exception as e:
            extra[f"{key}_error"] = f"{type(e).__name__}: {e}"[:200]

    # Flagship: 3D dam break at 1M (fall back to 100k if the chip can't).
    flagship_n = 1_000_000
    try:
        flag = _measure(dam_break_3d(flagship_n), 5, 20, reps=3, phases=True)
    except Exception as e:  # OOM or device fault: report the smaller config
        extra["flagship_error"] = f"{type(e).__name__}: {e}"[:300]
        flagship_n = 100_000
        flag = _measure(dam_break_3d(flagship_n), 5, 20, reps=3)
    extra[f"dam_break_3d_{flagship_n // 1000}k"] = flag

    # BASELINE config #5 per-chip share (VERDICT r03 #3): 16M over 8 chips
    # is 2M/chip, and membudget says 4M fits a single v5e with >10 GB to
    # spare — measure the actual per-chip perf at those scales (the 47%
    # window-plumbing share may shift with grid size). Phase split on the
    # 2M row; 4M is time-only.
    if flagship_n == 1_000_000:
        for scale_n, ph in ((2_000_000, True), (4_000_000, False)):
            key = f"dam_break_3d_{scale_n // 1000}k"
            try:
                extra[key] = _measure(
                    dam_break_3d(scale_n), 5, 20, reps=3, phases=ph
                )
            except Exception as e:
                extra[f"{key}_error"] = f"{type(e).__name__}: {e}"[:200]

    value = flag["particle_steps_per_sec"]
    headline = {
        "metric": "particle_steps_per_sec_3d_dam_break_1m",
        "value": round(value, 1),
        "unit": "particle-steps/s",
        "vs_baseline": round(value / NORTH_STAR, 6),
    }

    # Compact per-config summary (ms/step medians only) — keeps the
    # stdout line far below the driver's ~2000-char capture window.
    summary = {}
    for key, row in extra.items():
        if isinstance(row, dict) and "ms_per_step" in row:
            summary[key] = row["ms_per_step"]
        elif isinstance(row, dict) and "steps_per_sec" in row:
            summary[key] = {"steps_per_sec": round(row["steps_per_sec"], 1)}
        elif isinstance(row, str):  # *_error entries
            summary[key] = row[:80]
    headline["ms_per_step"] = summary

    # Full detail (reps, rebins, phase splits) goes to a file, not stdout.
    import os

    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"
    )
    with open(detail_path, "w") as f:
        json.dump({**headline, "extra": extra}, f, indent=1)

    line = json.dumps(headline)
    if len(line) > 1800:  # hard guard: never outgrow the capture window
        line = json.dumps({**headline, "ms_per_step": "see BENCH_DETAIL.json"})
    print(line)
    return 0


if __name__ == "__main__":
    sys.exit(main())
