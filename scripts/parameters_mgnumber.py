"""MG number type study: float vs double levels
(reference: scripts/parameters_mgnumber.py)."""

from sweep_common import write_config

counter = 0
for n_ref in (10, 11, 12):
    for t in ("float", "double"):
        write_config(counter, {"NRefGlobal": n_ref, "MGNumberType": t,
                               "DoParameterStudy": True})
        counter += 1
