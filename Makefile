# Test tiers (VERDICT r02 #8):
#   make check      — default tier, single command, < 5 min on the CPU mesh
#                     (what the driver's `pytest tests/ -x -q` runs too)
#   make check-all  — EVERYTHING: default + heavy numerics + slow contract
#                     tests (trajectory match vs the CPU oracle)
PY ?= python

check:
	$(PY) -m pytest tests/ -x -q

check-heavy:
	$(PY) -m pytest tests/ -q -m heavy

check-all:
	$(PY) -m pytest tests/ -q -m ""

bench:
	PYTHONPATH=. $(PY) bench.py

.PHONY: check check-heavy check-all bench
