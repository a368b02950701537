"""Uniform-hypercube sweep with FirstChildPolicy
(reference: scripts/small-scaling-hypercube.py)."""

from sweep_common import write_config

counter = 0
for n_ref in range(3, 20):
    for k in (1, 4):
        for solver in ("HMG-local", "HMG-global"):
            write_config(counter, {
                "Type": solver, "GeometryType": "hypercube",
                "NRefGlobal": n_ref, "Degree": k,
                "PartitionerName": "FirstChildPolicy",
            })
            counter += 1
