"""Cell-weight parameter study (reference: scripts/parameters_weights.py)."""

from sweep_common import write_config

counter = 0
for n_ref in (10, 11, 12):
    for w in (1.0, 1.25, 1.5, 1.75, 2.0, 2.25, 2.5, 2.75, 3.0):
        write_config(counter, {
            "NRefGlobal": n_ref,
            "PartitionerName": "CellWeightPolicy-%.2f" % w,
            "DoParameterStudy": True,
        })
        counter += 1
