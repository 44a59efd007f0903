"""Contract tests for the un-killable bench (VERDICT r04 #1).

BENCH_r03 parsed null and BENCH_r04 captured zero output — the driver's
round artifact has registered nothing for two rounds.  These tests pin
the output contract the restructured bench.py promises:

1. Happy path: the LAST stdout line is one short JSON headline with
   metric/value/unit/vs_baseline, and the full detail lands in the
   detail file — even when the wall-clock budget skips every optional
   row.
2. Hang path: if the run exceeds budget+grace mid-row, the watchdog
   still prints a parseable headline (flagged device_degraded) and
   exits 0.

Both run bench.py as a real subprocess on the CPU backend with a tiny
flagship (BENCH_FLAGSHIP_N), exactly how the driver invokes it.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
# Force the CPU platform inside the child: the image's sitecustomize pins
# the axon backend before env vars can take effect (tests/conftest.py).
CHILD = (
    "import jax; jax.config.update('jax_platforms','cpu');"
    "import bench, sys; sys.exit(bench.main())"
)


def _run_bench(tmp_path, env_extra, timeout):
    env = {
        **os.environ,
        "BENCH_DETAIL_PATH": str(tmp_path / "detail.json"),
        **env_extra,
    }
    proc = subprocess.run(
        [sys.executable, "-c", CHILD],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=timeout,
    )
    lines = [ln for ln in proc.stdout.splitlines() if ln.strip()]
    return proc, lines


def _parse_headline(line):
    head = json.loads(line)
    assert head["metric"] == "particle_steps_per_sec_3d_dam_break_1m"
    assert head["unit"] == "particle-steps/s"
    assert head["value"] > 0
    assert 0 < head["vs_baseline"] < 1
    # the driver's capture window is ~2000 chars
    assert len(line) < 1800
    return head


@pytest.mark.heavy
def test_headline_prints_even_when_budget_skips_all_optional_rows(tmp_path):
    # budget 10s: already spent by the time the flagship (which is never
    # budget-gated) finishes compiling, so every optional row skips;
    # grace 280s: ample room for the flagship's CPU compile (~60-90s) so
    # the watchdog never kills the healthy run
    proc, lines = _run_bench(
        tmp_path,
        {
            "BENCH_FLAGSHIP_N": "2048",
            "BENCH_BUDGET_S": "10",
            "BENCH_GRACE_S": "280",
        },
        timeout=350,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    # headline prints twice: right after the flagship AND at the end
    assert len(lines) >= 2
    first, last = _parse_headline(lines[0]), _parse_headline(lines[-1])
    assert "device_degraded" not in last
    assert first["value"] == last["value"]
    # optional rows were skipped with explicit markers, not silently
    detail = json.loads((tmp_path / "detail.json").read_text())
    skips = [v for v in detail["extra"].values()
             if isinstance(v, str) and v.startswith("skipped(budget")]
    assert skips, detail["extra"]
    # progress lines went to stderr (visible in the driver's tail)
    assert "[bench]" in proc.stderr


@pytest.mark.heavy
def test_watchdog_emits_degraded_headline_on_hang(tmp_path):
    # 100k flagship on CPU cannot finish inside budget+grace=4s: the
    # watchdog must fire mid-flagship, print a degraded headline, exit 0
    proc, lines = _run_bench(
        tmp_path,
        {
            "BENCH_FLAGSHIP_N": "100000",
            "BENCH_BUDGET_S": "1",
            "BENCH_GRACE_S": "3",
        },
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert lines, proc.stderr[-2000:]
    head = _parse_headline(lines[-1])
    assert head["device_degraded"] is True
    assert "WATCHDOG" in proc.stderr
