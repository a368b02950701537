"""Smoother-degree study (reference: scripts/parameters_smoother_degree.py)."""

from sweep_common import write_config

counter = 0
for n_ref in (10, 11, 12):
    for deg in (3, 6):
        write_config(counter, {
            "NRefGlobal": n_ref, "SmootherDegree": deg, "DoParameterStudy": True,
        })
        counter += 1
    write_config(counter, {"NRefGlobal": n_ref, "Type": "AMG",
                           "DoParameterStudy": True})
    counter += 1
