"""Capture + parse a jax.profiler device trace of the 1M step (PERF.md).

No xprof/tensorboard exists in this image, so the captured
``*.xplane.pb`` is decoded with a minimal protobuf wire-format walker
(field numbers from tensorflow/core/profiler/protobuf/xplane.proto):

  XSpace.planes=1 > XPlane{id=1,name=2,lines=3,event_metadata=4(map)}
  XLine{id=1,...,events=6}  XEvent{metadata_id=1,offset_ps=2,duration_ps=3}
  XEventMetadata{id=1,name=2}

Aggregates device-plane event durations by op/fusion name, prints the
top-N plus busy-time totals. Also dumps XLA's own cost_analysis for the
jitted step (logical flops/bytes) for roofline accounting.

Run: PYTHONPATH=/root/repo:/root/.axon_site \
     python scripts/trace_1m.py [N] [steps] [wcsph|pbf]
"""


from __future__ import annotations

import os as _os, sys as _sys  # bare-runnable: repo root on sys.path
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import glob
import gzip
import json
import os
import shutil
import sys
import time

import jax
import numpy as np

from sph_pie_tpu.scenes import dam_break_3d
from sph_pie_tpu.solvers import wcsph_binned


# ---------------- minimal protobuf wire walker ----------------

def _read_varint(buf, i):
    shift = 0
    out = 0
    while True:
        b = buf[i]
        i += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out, i
        shift += 7


def fields(buf):
    """Yield (field_number, wire_type, value) over a message buffer."""
    i, n = 0, len(buf)
    while i < n:
        key, i = _read_varint(buf, i)
        fn, wt = key >> 3, key & 7
        if wt == 0:
            v, i = _read_varint(buf, i)
        elif wt == 2:
            ln, i = _read_varint(buf, i)
            v = buf[i : i + ln]
            i += ln
        elif wt == 5:
            v = buf[i : i + 4]
            i += 4
        elif wt == 1:
            v = buf[i : i + 8]
            i += 8
        else:
            raise ValueError(f"wire type {wt}")
        yield fn, wt, v


def parse_xplane(path):
    buf = open(path, "rb").read()
    planes = []
    for fn, wt, v in fields(buf):
        if fn == 1 and wt == 2:  # XPlane
            plane = {"name": "", "lines": [], "event_meta": {}}
            for pfn, pwt, pv in fields(v):
                if pfn == 2 and pwt == 2:
                    plane["name"] = pv.decode(errors="replace")
                elif pfn == 3 and pwt == 2:  # XLine
                    events = []
                    for lfn, lwt, lv in fields(pv):
                        if lfn == 6 and lwt == 2:  # XEvent
                            md, dur = 0, 0
                            for efn, ewt, ev in fields(lv):
                                if efn == 1 and ewt == 0:
                                    md = ev
                                elif efn == 3 and ewt == 0:
                                    dur = ev
                            events.append((md, dur))
                    plane["lines"].append(events)
                elif pfn == 4 and pwt == 2:  # map<int64, XEventMetadata>
                    k, name = None, ""
                    for mfn, mwt, mv in fields(pv):
                        if mfn == 1 and mwt == 0:
                            k = mv
                        elif mfn == 2 and mwt == 2:
                            for emfn, emwt, emv in fields(mv):
                                if emfn == 1 and emwt == 0 and k is None:
                                    k = emv
                                elif emfn == 2 and emwt == 2:
                                    name = emv.decode(errors="replace")
                    if k is not None:
                        plane["event_meta"][k] = name
            planes.append(plane)
    return planes


def sync(x):
    return float(np.asarray(jax.device_get(x)))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    solver = sys.argv[3] if len(sys.argv) > 3 else "wcsph"
    scene = dam_break_3d(n_target=n)
    g, params = scene.bgrid, scene.params

    if solver == "pbf":
        from sph_pie_tpu.solvers import pbf

        pp = pbf.flagship_params()

        def simulate(params, g, bb, k):
            return pbf.simulate(params, g, pp, bb, k)

        def step1(bb):
            return pbf.step(params, g, pp, bb)
    else:

        def simulate(params, g, bb, k):
            return wcsph_binned.simulate(params, g, bb, k)

        def step1(bb):
            return wcsph_binned.step(params, g, bb)

    b = scene.binned_state()
    b = simulate(params, g, b, 5)  # settle + compile
    sync(b.travel)

    # XLA's own cost model for one jitted step (logical flops/bytes)
    lowered = jax.jit(step1).lower(b)
    compiled = lowered.compile()
    try:
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        keep = {
            k: v
            for k, v in ca.items()
            if k in ("flops", "bytes accessed", "transcendentals")
            or k.startswith("bytes accessed")
        }
        print(json.dumps({"cost_analysis": keep}), flush=True)
    except Exception as e:
        print(json.dumps({"cost_analysis_error": str(e)[:200]}), flush=True)

    trace_dir = "/tmp/sph_pie_trace"
    shutil.rmtree(trace_dir, ignore_errors=True)
    jax.profiler.start_trace(trace_dir)
    t0 = time.perf_counter()
    b = simulate(params, g, b, steps)
    sync(b.travel)
    wall_ms = (time.perf_counter() - t0) * 1e3
    jax.profiler.stop_trace()
    print(json.dumps({"traced_steps": steps, "wall_ms": round(wall_ms, 1)}),
          flush=True)

    paths = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
    if not paths:
        print(json.dumps({"error": "no xplane.pb produced", "dir": trace_dir}))
        return
    for path in paths:
        planes = parse_xplane(path)
        for plane in planes:
            name = plane["name"]
            agg = {}
            busy = 0
            for events in plane["lines"]:
                for md, dur in events:
                    opname = plane["event_meta"].get(md, f"meta{md}")
                    agg[opname] = agg.get(opname, 0) + dur
                    busy += dur
            if not agg:
                continue
            top = sorted(agg.items(), key=lambda kv: -kv[1])[:40]
            print(json.dumps({
                "plane": name,
                "n_ops": len(agg),
                "busy_ms_total_all_lines": round(busy / 1e9, 2),
                "top_ops_ms": [
                    [k[:110], round(v / 1e9, 3)] for k, v in top
                ],
            }), flush=True)


if __name__ == "__main__":
    main()
