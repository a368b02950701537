"""Large-scale h-multigrid sweep (reference: scripts/large_scaling.py)."""

import sys

from sweep_common import write_config

geometry = sys.argv[1] if len(sys.argv) > 1 else "quadrant"
counter = 0
for n_ref in range(4, 20):
    for k in (1, 4):
        for solver in ("HMG-local", "HMG-global"):
            write_config(counter, {
                "Type": solver, "GeometryType": geometry,
                "NRefGlobal": n_ref, "Degree": k,
            })
            counter += 1
