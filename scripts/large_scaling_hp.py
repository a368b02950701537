"""hp-multigrid variants per refinement (reference: scripts/large_scaling_hp.py)."""

from sweep_common import write_config

counter = 0
for n_ref in range(4, 20):
    for solver in ("HMG-local", "HMG-global", "PMG", "HPMG", "HPMG-local"):
        write_config(counter, {
            "Type": solver, "GeometryType": "quadrant",
            "NRefGlobal": n_ref, "Degree": 4,
        })
        counter += 1
