"""Analyse a jax.profiler device trace into the PERF.md cost breakdown.

Input: the trace-event JSON (``vm.trace.json.gz``) written by
``scripts/trace_1m.py`` (jax.profiler.trace around 3 steps of the 1M
WCSPH dam break). The 'XLA Ops' thread holds the device-time leaf ops;
events on one thread can nest (scopes), so wall-clock truth needs
EXCLUSIVE (self) times: for each event subtract the duration of events
strictly contained within it.

Classifies exclusive device time into semantic categories (pair-math
fusions vs window-gather plumbing vs rebin/sort vs control overhead) and
prints the table quoted in PERF.md, plus per-step totals and op counts.

Run: python scripts/trace_report.py [trace.json.gz] [n_steps]
"""


from __future__ import annotations

import os as _os, sys as _sys  # bare-runnable: repo root on sys.path
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import collections
import glob
import gzip
import json
import re
import sys


def load_ops(path):
    d = json.load(gzip.open(path))
    ev = d["traceEvents"]
    tids = {}
    for e in ev:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tids[(e["pid"], e["tid"])] = e["args"]["name"]
    ops = [
        e
        for e in ev
        if e.get("ph") == "X"
        and tids.get((e.get("pid"), e.get("tid"))) == "XLA Ops"
    ]
    ops.sort(key=lambda e: (e["ts"], -e.get("dur", 0)))
    return ops


def exclusive_times(ops):
    """Self time per event via a scope stack (events sorted by start)."""
    out = []
    stack = []  # (end_ts, child_total_accumulator_index)
    for e in ops:
        ts, dur = e["ts"], e.get("dur", 0)
        end = ts + dur
        while stack and stack[-1][0] <= ts:
            stack.pop()
        if stack:
            # e is nested inside stack[-1]: charge its full span to parent
            out[stack[-1][1]][1] -= dur
        out.append([e["name"], dur])
        stack.append((end, len(out) - 1))
    return out


CATEGORIES = (
    # (label, regex over op name) — first match wins
    ("dispatch gaps (module scope self)", r"^(step|jit_|main)\.?\d*$"),
    ("pallas density (custom-call)", r"custom-call|tpu_custom_call"),
    ("sort/rebin (key-value sorts)", r"sort"),
    ("scatter (rebin fill)", r"scatter"),
    ("pad fusion (window edges)", r"^fusion.*pad|pad"),
    ("copy (window gather)", r"^copy|copy-start|copy-done"),
    ("reshape/bitcast/concat", r"reshape|bitcast|transpose|concatenate"),
    ("slice/DUS (window plumbing)", r"dynamic[-_]slice|dynamic[-_]update|^slice"),
    ("while/cond overhead", r"while|^cond|conditional|tuple|parameter|constant"),
    ("convert", r"convert"),
    ("fusion (pair math + misc)", r"fusion"),
    ("other", r""),
)


def classify(name):
    n = name.lower()
    for label, pat in CATEGORIES:
        if re.search(pat, n):
            return label
    return "other"


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else sorted(
        glob.glob("/tmp/sph_pie_trace/plugins/profile/*/vm.trace.json.gz")
    )[-1]
    n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    ops = load_ops(path)
    excl = exclusive_times(ops)

    by_cat = collections.Counter()
    cnt_cat = collections.Counter()
    by_op = collections.Counter()
    cnt_op = collections.Counter()
    for name, self_us in excl:
        c = classify(name)
        by_cat[c] += self_us
        cnt_cat[c] += 1
        by_op[name] += self_us
        cnt_op[name] += 1

    total = sum(by_cat.values())
    print(f"trace: {path}")
    print(f"device ops: {len(ops)}  exclusive total: {total/1e3:.1f} ms "
          f"({total/1e3/n_steps:.1f} ms/step over {n_steps} steps)\n")
    print(f"{'category':<34}{'ms/step':>9}{'share':>8}{'ops/step':>10}")
    for c, us in by_cat.most_common():
        print(f"{c:<34}{us/1e3/n_steps:>9.1f}{us/total:>8.1%}"
              f"{cnt_cat[c]/n_steps:>10.0f}")
    print("\ntop 15 ops by exclusive time:")
    for name, us in by_op.most_common(15):
        print(f"  {us/1e3/n_steps:>7.2f} ms/step  x{cnt_op[name]/n_steps:<7.0f}"
              f" {name[:90]}")


if __name__ == "__main__":
    main()
