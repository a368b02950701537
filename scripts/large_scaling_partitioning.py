"""Partitioning-policy comparison (reference: scripts/large_scaling_partitioning.py)."""

from sweep_common import write_config

counter = 0
for n_ref in range(4, 20):
    for k in (1, 4):
        for solver, partitioner in (
            ("HMG-local", ""),
            ("HMG-global", ""),
            ("HMG-global", "FirstChildPolicy-2.0"),
        ):
            over = {"Type": solver, "GeometryType": "quadrant",
                    "NRefGlobal": n_ref, "Degree": k}
            if partitioner:
                over["PartitionerName"] = partitioner
            write_config(counter, over)
            counter += 1
