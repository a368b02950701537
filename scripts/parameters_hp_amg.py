"""hp + AMG-coarse study (reference: scripts/parameters_hp_amg.py).

The reference's design truncates ALL h-levels (MinLevel = n_ref + 1, which
with the keep-from-first-satisfying-tria rule leaves only the fine mesh):
the V-cycle descends the p-chain on the fine mesh and the AMG coarse solver
works on the volume-sized p=1 problem — that is where the flavours
(ML-analog vs BoomerAMG-analog) and CoarseSolverNCycles 1-4 separate.
Comparators per refinement, as upstream: full-hierarchy HPMG-local and
HPMG with a single AMG cycle.
"""

import sys

from sweep_common import write_config

refs = [int(a) for a in sys.argv[1:]] or [5, 6, 7]


def run_instance(counter, solver, n_ref, min_level, coarse_type, n_cycles):
    write_config(counter, {
        "Type": solver,
        "NRefGlobal": n_ref,
        "Degree": 4,
        "MinLevel": min_level,
        "CoarseGridSolverType": coarse_type,
        "CoarseSolverNCycles": n_cycles,
    })


counter = 0
for n_ref in refs:
    run_instance(counter, "HPMG-local", n_ref, 0, "amg", 1)
    counter += 1
    run_instance(counter, "HPMG", n_ref, 0, "amg", 1)
    counter += 1
    for k in range(1, 5):
        run_instance(counter, "HPMG", n_ref, n_ref + 1, "amg", k)
        counter += 1
    run_instance(counter, "HPMG", n_ref, n_ref + 1, "amg_petsc", 2)
    counter += 1
