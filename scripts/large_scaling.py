"""Large-scale h-multigrid sweep (reference: scripts/large_scaling.py).

argv[1]: geometry (default quadrant).  Optional argv[2]: comma-separated
shard counts — each config is emitted once per count with NShards set (the
reference's rank-count axis; see large_scaling_partitioning.py).
"""

import sys

from sweep_common import write_config

geometry = sys.argv[1] if len(sys.argv) > 1 else "quadrant"
shard_counts = (
    [int(s) for s in sys.argv[2].split(",")] if len(sys.argv) > 2 else [None]
)
counter = 0
for n_ref in range(4, 20):
    for k in (1, 4):
        for solver in ("HMG-local", "HMG-global"):
            for ns in shard_counts:
                over = {"Type": solver, "GeometryType": geometry,
                        "NRefGlobal": n_ref, "Degree": k}
                if ns is not None:
                    over["NShards"] = ns
                write_config(counter, over)
                counter += 1
