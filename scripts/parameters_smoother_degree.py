"""Smoother-degree study (reference: scripts/parameters_smoother_degree.py)."""

import sys

from sweep_common import write_config

# optional argv refs: the reference pins (10, 11, 12) for its 48-node SKX
# runs; on one chip pass e.g. "5 6 7" for the same sweep shape at
# tractable sizes
refs = [int(a) for a in sys.argv[1:]] or [10, 11, 12]

counter = 0
for n_ref in refs:
    for deg in (3, 6):
        write_config(counter, {
            "NRefGlobal": n_ref, "SmootherDegree": deg, "DoParameterStudy": True,
        })
        counter += 1
    write_config(counter, {"NRefGlobal": n_ref, "Type": "AMG",
                           "DoParameterStudy": True})
    counter += 1
