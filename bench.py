"""Benchmark entry point (driver contract: prints ONE SHORT JSON line).

Flagship metric per BASELINE.json: particle-steps/sec on the 3D dam break
at 1M particles, single chip. vs_baseline is the fraction of the BASELINE
north-star target (1e9 particle-steps/sec on a v5e-8); the reference repo
itself publishes no numbers (BASELINE.md).

Un-killable output contract (VERDICT r04 #1 — BENCH_r03 parsed null,
BENCH_r04 was rc=124 with ZERO output after the tunnelled device hung):

- The flagship 1M row runs FIRST; its short headline JSON line prints,
  flushed, the moment it completes — before any optional row.
- One short flushed progress line per completed/skipped config, so a
  killed run still shows where it died (the driver captures a ~2000-char
  stdout tail).
- Internal wall-clock budget ``BENCH_BUDGET_S`` (default 420 s): optional
  rows that don't fit are skipped with explicit markers and the final
  headline still prints.
- Startup watchdog: if a trivial device op hasn't completed within
  ``BENCH_STARTUP_S`` (default 90 s) — the observed axon-tunnel hang mode
  — the bench prints a headline carrying the last committed numbers with
  ``"device_degraded": true`` and exits 0.  The same watchdog hard-stops
  a run that hangs mid-row past the budget plus grace.
- ``BENCH_DETAIL.json`` (full per-config detail) is rewritten after every
  completed row, so partial results survive any kill, and the file is
  committed each round as the durable record.
- The headline prints again at the very end (identical schema), so it is
  always inside the captured tail even after many progress lines.

Hygiene (VERDICT r02 #5): every timed window is >= 20 steps and repeated
>= 3 times; rows report the MEDIAN ms/step plus all reps, the rebin count
over the timed window, and (for the flagship) standalone per-phase times.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import threading
import time

NORTH_STAR = 1.0e9  # particle-steps/sec, v5e-8 (BASELINE.json north_star)
# The measurement budget counts from DEVICE-READY (probe complete), not
# process start: the axon grant alone has been observed to take 3-8
# minutes on a healthy session (r05 live probes), and charging that wait
# against the measurement window would skip every optional row on a
# session that is merely slow to grant.
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "480"))
# Startup deadline (from process start): converts a truly wedged tunnel
# into a degraded-headline exit instead of silence.  540s tolerates the
# observed slow-grant mode; one r05 run saw the probe still pending at
# 300s on a session that later granted.
STARTUP_S = float(os.environ.get("BENCH_STARTUP_S", "540"))
# Hang ceiling: the watchdog hard-stops at probe_t + BUDGET_S + GRACE_S.
# Grace must cover one honest mid-flight row (cold 1M compile ~2 min) so
# a slow-but-healthy run is never killed — only a wedged tunnel is.
# Worst-case total wall: STARTUP + BUDGET + GRACE = 19 min, inside the
# driver's capture window (r03's ~20 min full run completed with rc=0).
GRACE_S = float(os.environ.get("BENCH_GRACE_S", "120"))
# TEST-ONLY knob: lets tests/test_bench_contract.py drive the full happy
# path on a tiny CPU scene.  Real runs must leave this at 1M — the
# headline metric name is fixed to the 1M flagship.
FLAGSHIP_N = int(os.environ.get("BENCH_FLAGSHIP_N", "1000000"))
T0 = time.time()

# Last builder-measured flagship number (PERF.md, 2026-08-20, v5 lite
# single chip via axon): used ONLY when the device is degraded and no
# committed BENCH_DETAIL.json is available.
FALLBACK_VALUE = 8.07e6

_DETAIL_PATH = os.environ.get("BENCH_DETAIL_PATH") or os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"
)
_state = {
    "rows": {},  # config name -> row dict / skip marker / error string
    "flagship": None,  # measured flagship row, once available
    "probe_ok": False,
    "probe_t": None,  # time.time() when the device probe completed
    "headline_printed": False,
}
_lock = threading.Lock()


def _log(msg: str):
    """Short flushed progress line; stderr so stdout stays JSON-only for
    the driver's parser, but ALSO visible in a captured combined tail."""
    print(f"[bench] t={time.time() - T0:.0f}s {msg}", file=sys.stderr, flush=True)


def _headline_dict() -> dict:
    """Build the headline from the best information available right now."""
    with _lock:
        flag = _state["flagship"]
        rows = dict(_state["rows"])
    if flag is not None:
        value = flag["particle_steps_per_sec"]
        degraded = False
        source = "measured"
    else:
        value, source = FALLBACK_VALUE, "builder_r04_fallback"
        try:  # committed detail from a prior completed run beats hardcode
            with open(_DETAIL_PATH) as f:
                prev = json.load(f)
            if isinstance(prev.get("value"), (int, float)) and not prev.get(
                "device_degraded"
            ):
                value, source = prev["value"], "last_committed_detail"
        except (OSError, ValueError):
            pass
        degraded = True
    head = {
        "metric": "particle_steps_per_sec_3d_dam_break_1m",
        "value": round(float(value), 1),
        "unit": "particle-steps/s",
        "vs_baseline": round(float(value) / NORTH_STAR, 6),
    }
    if degraded:
        head["device_degraded"] = True
        head["source"] = source
    summary = {}
    for key, row in rows.items():
        if isinstance(row, dict) and "ms_per_step" in row:
            summary[key] = row["ms_per_step"]
        elif isinstance(row, dict) and "steps_per_sec" in row:
            summary[key] = {"steps_per_sec": round(row["steps_per_sec"], 1)}
        elif isinstance(row, str):
            summary[key] = row[:60]
    head["ms_per_step"] = summary
    return head


def _print_headline():
    head = _headline_dict()
    line = json.dumps(head)
    if len(line) > 1800:  # hard guard: never outgrow the capture window
        line = json.dumps({**head, "ms_per_step": "see BENCH_DETAIL.json"})
    print(line, flush=True)
    with _lock:
        _state["headline_printed"] = True


def _write_detail():
    head = _headline_dict()
    with _lock:
        extra = dict(_state["rows"])
    try:
        with open(_DETAIL_PATH, "w") as f:
            json.dump({**head, "extra": extra}, f, indent=1)
    except OSError as e:
        _log(f"detail write failed: {e}")


def _watchdog():
    """Backstop for device hangs the main thread cannot escape: the axon
    tunnel has been observed to block a trivial matmul readback for 3+
    minutes (VERDICT r04).  Emits the best-available headline and exits
    the process; partial detail is already on disk."""
    while True:
        time.sleep(2.0)
        now = time.time()
        with _lock:
            probe_t = _state["probe_t"]
        if probe_t is None:
            if now - T0 > STARTUP_S:
                _log(
                    f"WATCHDOG: device probe not done after "
                    f"{now - T0:.0f}s — degraded exit"
                )
                _write_detail()
                _print_headline()
                sys.stdout.flush()
                os._exit(0)
        elif now - probe_t > BUDGET_S + GRACE_S:
            _log(
                f"WATCHDOG: budget+grace exceeded "
                f"({now - probe_t:.0f}s past probe) — emergency exit"
            )
            _write_detail()
            _print_headline()
            sys.stdout.flush()
            os._exit(0)


def _enable_compile_cache():
    """Persistent XLA compilation cache: the 1M-scene compiles cost ~2 min
    cold; cached reruns (driver invokes bench every round) skip them."""
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
    axon backend, jax.block_until_ready can return BEFORE device work is
    done (observed: a 500-step roll "completing" in 3 ms); a scalar
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


def _probe_device():
    """Trivial device op with a scalar readback — the canonical axon hang
    reproducer.  The watchdog converts a hang here into a degraded exit."""
    import jax.numpy as jnp
    import numpy as np

    x = jnp.ones((256, 256), jnp.float32) @ jnp.ones((256, 256), jnp.float32)
    val = float(np.asarray(x)[0, 0])
    with _lock:
        _state["probe_ok"] = True
        _state["probe_t"] = time.time()
    import jax

    _log(f"probe ok ({jax.devices()[0].platform}, matmul={val:.0f})")


def _run_row(key: str, fn, est_s: float):
    """Run one optional row under the budget; record result/skip/error."""
    with _lock:
        t_ready = _state["probe_t"] or T0
    el = time.time() - t_ready
    if el + est_s > BUDGET_S:
        with _lock:
            _state["rows"][key] = f"skipped(budget: t={el:.0f}s est={est_s:.0f}s)"
        _log(f"{key} SKIPPED (budget)")
        return
    try:
        row = fn()
        with _lock:
            _state["rows"][key] = row
        ms = row.get("ms_per_step", row.get("wall_s"))
        _log(f"{key} ok ms/step={ms}")
    except Exception as e:
        with _lock:
            _state["rows"][key] = f"{type(e).__name__}: {e}"[:200]
        _log(f"{key} ERROR {type(e).__name__}")
    _write_detail()


def main() -> int:
    threading.Thread(target=_watchdog, daemon=True).start()
    _enable_compile_cache()
    _probe_device()

    from sph_pie_tpu.scenes import dam_break_2d, dam_break_3d

    # ---- flagship FIRST: 3D dam break at 1M (fall back to 100k) --------
    flagship_n = FLAGSHIP_N
    try:
        flag = _measure(dam_break_3d(flagship_n), 5, 20, reps=3, phases=True)
    except Exception as e:  # OOM or device fault: report the smaller config
        with _lock:
            _state["rows"]["flagship_error"] = f"{type(e).__name__}: {e}"[:300]
        flagship_n = 100_000
        try:
            flag = _measure(dam_break_3d(flagship_n), 5, 20, reps=3)
        except Exception as e2:  # both sizes dead: degraded headline, done
            with _lock:
                _state["rows"]["flagship_100k_error"] = (
                    f"{type(e2).__name__}: {e2}"[:300]
                )
            _write_detail()
            _print_headline()
            return 0
    with _lock:
        _state["rows"][f"dam_break_3d_{flagship_n // 1000}k"] = flag
        if flagship_n == FLAGSHIP_N:
            _state["flagship"] = flag
    _log(f"flagship {flagship_n // 1000}k ok ms/step={flag['ms_per_step']}")
    _write_detail()
    # the headline registers NOW — everything after this is bonus detail
    _print_headline()

    # ---- optional rows, most valuable first, each budget-gated ---------
    _run_row(
        "pbf_3d_1m",
        lambda: _measure_pbf(1_000_000, 20, 3, render=False),
        est_s=90,
    )
    # Secondary: 2D 4k demo. Settle 2500 steps first: the r03 3-rep
    # spread was 2.2x because a 200-step warm leaves the column
    # mid-collapse; timing the quasi-steady slosh + 5 reps brings the
    # spread under 1.2x (VERDICT r03 #7).
    _run_row(
        "dam_break_2d_4k",
        lambda: _measure(dam_break_2d(4096), 2500, 1000, reps=5),
        est_s=60,
    )
    _run_row("emitter_2d_4k", _measure_emitter, est_s=45)
    # BASELINE config #3: 3D dam break at 100k with the cohesion /
    # surface-tension term (dam_break_3d defaults surface_tension=0.25)
    _run_row(
        "dam_break_3d_100k_st",
        lambda: _measure(dam_break_3d(100_000), 5, 20),
        est_s=45,
    )
    _run_row("pbf_3d_100k", _measure_pbf, est_s=45)
    # BASELINE config #4 as written: PBF at 1M WITH the on-device splat
    # render inside the timed loop
    _run_row(
        "pbf_3d_1m_render",
        lambda: _measure_pbf(1_000_000, 20, 3, render=True),
        est_s=90,
    )
    # BASELINE config #5 per-chip share (VERDICT r03 #3): 16M over 8
    # chips is 2M/chip; 4M fits a single v5e with >10 GB to spare.
    if flagship_n == 1_000_000:
        _run_row(
            "dam_break_3d_2000k",
            lambda: _measure(dam_break_3d(2_000_000), 5, 20, reps=3, phases=True),
            est_s=120,
        )
        _run_row(
            "dam_break_3d_4000k",
            lambda: _measure(dam_break_3d(4_000_000), 5, 20, reps=3),
            est_s=120,
        )

    _write_detail()
    # final re-print: identical schema, now with the full row summary,
    # guaranteed inside the driver's captured stdout tail
    _print_headline()
    return 0


if __name__ == "__main__":
    sys.exit(main())
