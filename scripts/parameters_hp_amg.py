"""hp + AMG-coarse study: coarse cycles 1-4 vs second AMG flavour
(reference: scripts/parameters_hp_amg.py).

The reference runs this where the coarse grid is the bottleneck (768-24576
ranks); the single-chip analog is a MinLevel-truncated hierarchy, so each
refinement is swept twice: full hierarchy (MinLevel default) and truncated
(MinLevel = n_ref - 2, leaving a volume-scale coarse problem where the AMG
flavours and cycle counts separate in outer iterations).
"""

import sys

from sweep_common import write_config

refs = [int(a) for a in sys.argv[1:]] or [10, 11, 12]

counter = 0
for n_ref in refs:
    for min_level in (None, max(n_ref - 2, 1)):
        for cycles in (1, 2, 3, 4):
            over = {
                "Type": "HPMG", "NRefGlobal": n_ref,
                "CoarseGridSolverType": "amg", "CoarseSolverNCycles": cycles,
            }
            if min_level is not None:
                over["MinLevel"] = min_level
            write_config(counter, over)
            counter += 1
        over = {
            "Type": "HPMG", "NRefGlobal": n_ref,
            "CoarseGridSolverType": "amg_petsc",
        }
        if min_level is not None:
            over["MinLevel"] = min_level
        write_config(counter, over)
        counter += 1
