"""hp + AMG-coarse study: coarse cycles 1-4 vs second AMG flavour
(reference: scripts/parameters_hp_amg.py)."""

from sweep_common import write_config

counter = 0
for n_ref in (10, 11, 12):
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
