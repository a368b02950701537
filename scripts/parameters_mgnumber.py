"""MG number type study: float vs double levels
(reference: scripts/parameters_mgnumber.py)."""

import sys

from sweep_common import write_config

refs = [int(a) for a in sys.argv[1:]] or [10, 11, 12]

counter = 0
for n_ref in refs:
    for t in ("float", "double"):
        write_config(counter, {"NRefGlobal": n_ref, "MGNumberType": t,
                               "DoParameterStudy": True})
        counter += 1
