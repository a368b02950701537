"""Solver-tolerance study (reference: scripts/parameters_tolerance.py)."""

from sweep_common import write_config

counter = 0
for n_ref in (10, 11, 12):
    for tol in (1e-4, 1e-6, 1e-8, 1e-10):
        write_config(counter, {"NRefGlobal": n_ref, "RelativeTolerance": tol})
        counter += 1
