"""Host-side: per-level hybrid-format shape for different patch sizes K.

For each GC level of the quadrant mesh, build the hybrid format at K in
{4, 8, 16} and print NP/NS/n_slots/irregular-slot counts — the inputs to
the per-level cost model (slots ~ bandwidth, irr slots ~ 7 ns/elem each,
singleton lattices pay lane-hostile relayouts).

Usage: python scripts/analyze_k_choice.py [r] [p] [geometry]
"""

import sys
import time

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def main():
    r = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    p = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    geom = sys.argv[3] if len(sys.argv) > 3 else "quadrant"

    from dealii_multigrid_tpu import api
    from dealii_multigrid_tpu.mesh import generators
    from dealii_multigrid_tpu.mesh.coarsening import geometric_coarsening_sequence
    from dealii_multigrid_tpu.mesh.dof import distribute_dofs
    from dealii_multigrid_tpu.ops.hybrid import build_hybrid_format

    mesh = generators.create(geom, 3, r, 0)
    tri_seq = geometric_coarsening_sequence(mesh)
    plan = api.gc_level_plan("HMG-global", tri_seq, p)
    for li, (m, d) in enumerate(plan):
        t0 = time.time()
        dofh = distribute_dofs(m, d)
        row = [f"level {li} (p={d}, {m.n_cells} cells, {dofh.n_dofs} dofs):"]
        print(row[0])
        for K in (4, 8, 16):
            try:
                t1 = time.time()
                fmt = build_hybrid_format(dofh, K=K, min_patches=1)
                n_irr = len(fmt.irr_out_slots)
                print(
                    f"   K={K:2d} -> actualK={fmt.K} NP={fmt.n_patches:6d} "
                    f"NS={fmt.n_singles:7d} n_slots={fmt.n_slots:9d} "
                    f"irr_slots={n_irr:7d} ssweep={fmt.use_singleton_sweeps} "
                    f"({time.time()-t1:.1f}s)"
                )
            except Exception as e:  # noqa: BLE001
                print(f"   K={K:2d} -> FAILED {type(e).__name__}: {e}")
        print(f"   ({time.time()-t0:.1f}s total)")


if __name__ == "__main__":
    main()
