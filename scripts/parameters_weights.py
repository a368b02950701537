"""Cell-weight parameter study (reference: scripts/parameters_weights.py:26).

The reference sweeps refs 10-12 at 768 ranks; refs may be overridden on
argv for the single-chip TPU capture (r>=8 is multi-chip by design —
CLAUDE.md envelope)."""

import sys

from sweep_common import write_config

refs = [int(a) for a in sys.argv[1:]] or [10, 11, 12]

counter = 0
for n_ref in refs:
    for w in (1.0, 1.25, 1.5, 1.75, 2.0, 2.25, 2.5, 2.75, 3.0):
        write_config(counter, {
            "NRefGlobal": n_ref,
            "PartitionerName": "CellWeightPolicy-%.2f" % w,
            "DoParameterStudy": True,
        })
        counter += 1
