"""Benchmark: matrix-free multigrid CG throughput on the reference's default
config family (HMG-global, quadrant mesh, Chebyshev(3), coarse direct/AMG,
rtol 1e-4 — reference scripts/default.json) at quadrant r=7/p=4
(17.55M DoF), the largest configuration whose setup fits the round budget.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "DoF/s", "vs_baseline": N}

Baseline: the repo north-star is >= 2 GDoF/s aggregate CG throughput
(n_dofs * n_iterations / solve_time) at p=4 on TPU v5p-32 (16 chips);
vs_baseline is measured single-chip throughput / (2e9 / 16) = x125 MDoF/s.
"""

import json
import sys
import time


def main() -> int:
    import jax

    from dealii_multigrid_tpu import api
    from dealii_multigrid_tpu.mesh import generators
    from dealii_multigrid_tpu.utils.params import RunParameters

    params = RunParameters()
    params.type = "HMG-global"
    params.geometry_type = "quadrant"
    params.n_ref_global = 7
    params.fe_degree_fine = 4  # north-star config is p=4
    # f32 outer CG with full-precision (3-pass bf16) contractions matches the
    # double-outer iteration counts at rtol 1e-4 (see DESIGN.md); double stays
    # available for tighter tolerances.
    params.number_type = "float"
    params.mg_number_type = "float"
    params.mg_data.coarse_solver.type = "amg"
    params.mg_data.smoother.degree = 3
    params.mg_data.cg_normal.reltol = 1e-4
    params.mg_data.n_repetitions = 5

    t0 = time.time()
    mesh = generators.create(
        params.geometry_type, params.dim, params.n_ref_global, params.n_ref_local
    )
    result, problem, levels = api.solve_with_global_coarsening_hybrid(params, mesh)
    setup_time = time.time() - t0

    per_chip_baseline = 2.0e9 / 16.0
    out = {
        "metric": "mg_cg_throughput_quadrant_p4_1chip",
        "value": result.throughput,
        "unit": "DoF/s",
        "vs_baseline": result.throughput / per_chip_baseline,
        "n_dofs": result.n_dofs,
        "n_iterations": result.n_iterations,
        "converged": result.converged,
        "solve_time_s": result.time,
        "setup_time_s": setup_time,
        "n_levels": result.n_levels,
        "device": str(jax.devices()[0].device_kind),
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
