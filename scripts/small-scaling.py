"""h-multigrid scaling sweep: HMG-local vs HMG-global, p in {1,4}, growing
refinement (reference: scripts/small-scaling.py)."""

import sys

from sweep_common import write_config

geometry = sys.argv[1] if len(sys.argv) > 1 else "quadrant"
partitioner = sys.argv[2] if len(sys.argv) > 2 else ""
min_ref = {"quadrant": 3, "annulus": 5}.get(geometry)
if min_ref is None:
    raise SystemExit("Geometry type not known!")
solvers = ["HMG-global"] if partitioner else ["HMG-local", "HMG-global"]

counter = 0
for n_ref in range(min_ref, 20):
    for k in (1, 4):
        for solver in solvers:
            over = {"Type": solver, "GeometryType": geometry,
                    "NRefGlobal": n_ref, "Degree": k}
            if partitioner:
                over["PartitionerName"] = partitioner
            write_config(counter, over)
            counter += 1
