"""Envelope probe: quadrant r=8/p=4 (~138M DoF) single-chip solve.

The reference's sweeps run refinements 3..19 across MPI ranks
(/root/reference/scripts/small-scaling.py:47-50); this probes the
largest single-chip point: ~138M DoF, one f32 volume ~620 MB, a chain
PCG program holding ~10-14 live fine volumes + per-level masks —
~11-13 GB of 16 GB v5e HBM.  Host build is covered by the proven
r=9/p=2 envelope (136M DoF, results/setup-envelope-host.txt).

Prints one JSON row (results/ artifact, not the headline bench metric —
the headline stays at r=7/p=4 for round-over-round comparability).

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/probe_r8_solve.py [r] [p]
"""

import json
import os
import sys
import time

if os.environ.get("MGTPU_PLATFORM"):  # CPU smoke-testing
    import jax as _jax_platform_shim

    _jax_platform_shim.config.update(
        "jax_platforms", os.environ["MGTPU_PLATFORM"]
    )


def main():
    r = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    p = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    import dealii_multigrid_tpu as _pkg

    _pkg.enable_transparent_hugepages()
    from dealii_multigrid_tpu import api
    from dealii_multigrid_tpu.mesh import generators
    from dealii_multigrid_tpu.utils.params import RunParameters

    params = RunParameters()
    params.type = "HMG-global"
    params.geometry_type = "quadrant"
    params.n_ref_global = r
    params.fe_degree_fine = p
    params.number_type = "float"
    params.mg_number_type = "float"
    params.mg_data.coarse_solver.type = "amg"
    params.mg_data.smoother.degree = 3
    params.mg_data.cg_normal.reltol = 1e-4
    params.mg_data.n_repetitions = 5

    t0 = time.time()
    mesh = generators.create(params.geometry_type, 3, r, 0)
    print(f"mesh {time.time()-t0:.0f}s n_cells={mesh.n_cells}", flush=True)
    result, problem, levels = api.solve_with_global_coarsening_hybrid(
        params, mesh
    )
    setup_time = time.time() - t0
    row = {
        "metric": f"mg_cg_throughput_quadrant_r{r}_p{p}_1chip",
        "value": result.throughput,
        "unit": "DoF/s",
        "n_dofs": result.n_dofs,
        "n_iterations": result.n_iterations,
        "converged": result.converged,
        "solve_time_s": result.time,
        "setup_time_s": setup_time,
        "n_levels": result.n_levels,
    }
    row["hot_bound"] = os.environ.get("MGTPU_HOT_BOUND", "")
    print(json.dumps(row), flush=True)
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(here, "results", f"probe-r{r}p{p}.json"), "a") as f:
        f.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
