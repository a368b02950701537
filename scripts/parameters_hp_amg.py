"""hp + AMG-coarse study: coarse cycles 1-4 vs second AMG flavour
(reference: scripts/parameters_hp_amg.py)."""

import sys

from sweep_common import write_config

refs = [int(a) for a in sys.argv[1:]] or [10, 11, 12]

counter = 0
for n_ref in refs:
    for cycles in (1, 2, 3, 4):
        write_config(counter, {
            "Type": "HPMG", "NRefGlobal": n_ref,
            "CoarseGridSolverType": "amg", "CoarseSolverNCycles": cycles,
        })
        counter += 1
    write_config(counter, {
        "Type": "HPMG", "NRefGlobal": n_ref,
        "CoarseGridSolverType": "amg_petsc",
    })
    counter += 1
