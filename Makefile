# Test tiers (VERDICT r02 #8):
#   make check      — default tier, single command, < 5 min on the CPU mesh
#                     (what the driver's `pytest tests/ -x -q` runs too)
#   make check-all  — EVERYTHING: default + heavy numerics + slow contract
#                     tests (trajectory match vs the CPU oracle)
PY ?= python

check:
	$(PY) -m pytest tests/ -x -q

# The heavy tier (compile-heavy tests) does NOT fit one 10-minute
# command on the 1-CPU mesh (VERDICT r03 #8). Run it as four serial
# chunks, each < 10 min (r05 measured: 5:43 / 6:21 / 7:52 / 5:55);
# `make check-heavy` runs them back-to-back (fine without a per-command
# timeout; budget ~30 min total).
check-heavy-1:
	$(PY) -m pytest tests/test_bench_contract.py \
	  tests/test_binned.py tests/test_calendar_frontend.py -q -m heavy

check-heavy-2:
	$(PY) -m pytest tests/test_halo.py tests/test_pallas_pair.py \
	  tests/test_pallas_sym.py tests/test_pbf.py -q -m heavy

check-heavy-3:
	$(PY) -m pytest tests/test_balance.py tests/test_periodic.py \
	  tests/test_scenes.py tests/test_sharding.py -q -m heavy

# chunk 4 carries the two dryrun_multichip subprocess tests (~5 min of
# its ~7: each boots a fresh 8-virtual-device process and runs all legs)
check-heavy-4:
	$(PY) -m pytest tests/test_checkpoint_config.py \
	  tests/test_ghost_walls.py tests/test_graft_entry.py -q -m heavy

check-heavy: check-heavy-1 check-heavy-2 check-heavy-3 check-heavy-4

# Slow contract tests (3): trajectory match vs the CPU oracle + PBF
# quality bars. ~10-15 min on the 1-CPU mesh.
check-slow:
	$(PY) -m pytest tests/ -q -m slow

check-all: check check-heavy check-slow

# NOTE: do not clobber PYTHONPATH here — the axon TPU plugin is loaded
# via a PYTHONPATH entry in this environment, and bench.py resolves the
# package from its own directory anyway.
bench:
	$(PY) bench.py

.PHONY: check check-heavy check-heavy-1 check-heavy-2 check-heavy-3 \
  check-heavy-4 check-slow check-all bench
