"""Solver-tolerance study (reference: scripts/parameters_tolerance.py:27).

The reference sweeps refs 10-12 at 768 ranks; refs may be overridden on
argv for the single-chip TPU capture (r>=8 is multi-chip by design —
CLAUDE.md envelope)."""

import sys

from sweep_common import write_config

refs = [int(a) for a in sys.argv[1:]] or [10, 11, 12]

counter = 0
for n_ref in refs:
    for tol in (1e-4, 1e-6, 1e-8, 1e-10):
        write_config(counter, {"NRefGlobal": n_ref, "RelativeTolerance": tol})
        counter += 1
