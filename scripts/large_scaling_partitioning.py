"""Partitioning-policy comparison (reference: scripts/large_scaling_partitioning.py).

Optional argv[1]: comma-separated shard counts (e.g. "8,1") — each config is
emitted once per count with NShards set.  The reference picks its rank count
via the SLURM job size (experiments-skx/large-scaling-create-job-files.py);
here the shard count IS that axis, and NShards=8 on the virtual CPU mesh is
the single-host analog of the distributed run.
"""

import sys

from sweep_common import write_config

shard_counts = (
    [int(s) for s in sys.argv[1].split(",")] if len(sys.argv) > 1 else [None]
)
counter = 0
for n_ref in range(4, 20):
    for k in (1, 4):
        for solver, partitioner in (
            ("HMG-local", ""),
            ("HMG-global", ""),
            ("HMG-global", "FirstChildPolicy-2.0"),
        ):
            for ns in shard_counts:
                over = {"Type": solver, "GeometryType": "quadrant",
                        "NRefGlobal": n_ref, "Degree": k}
                if partitioner:
                    over["PartitionerName"] = partitioner
                if ns is not None:
                    over["NShards"] = ns
                write_config(counter, over)
                counter += 1
