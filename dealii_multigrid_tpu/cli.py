"""Benchmark driver CLI: `python -m dealii_multigrid_tpu.cli input_*.json`.

Mirror of the reference executable's main() (multigrid_throughput.cc:2398-2470):
parse each JSON parameter file, run it, append one row to a cumulative
ConvergenceTable printed after every run.
"""

from __future__ import annotations

import sys

from . import api
from .mesh import generators
from .models import poisson
from .parallel import metrics
from .utils.params import RunParameters
from .utils.table import ConvergenceTable


def run_config(params: RunParameters, table: ConvergenceTable) -> None:
    mesh = generators.create(
        params.geometry_type, params.dim, params.n_ref_global, params.n_ref_local
    )
    table.new_row()
    table.add_value("dim", params.dim)
    table.add_value("type", params.type)
    table.add_value("geometry", params.geometry_type)
    table.add_value("n_cells", mesh.n_cells)
    table.add_value("degree", params.fe_degree_fine)
    table.add_value("n_ref_global", params.n_ref_global)
    table.add_value("n_ref_local", params.n_ref_local)

    result, problem, levels = api.dispatch_solve(params, mesh)

    # hanging-node cell census (reference: multigrid_throughput.cc:2177-2190)
    import numpy as np

    dofh = problem.dofh
    slave_set = np.zeros(dofh.n_dofs, bool)
    hang_slaves = np.asarray(problem.op.hanging.slave)
    slave_set[hang_slaves] = True
    n_hn = int(slave_set[dofh.cell_dofs].any(axis=1).sum())
    table.add_value("n_cells_hn", n_hn)
    table.add_value("n_cells_n", mesh.n_cells - n_hn)

    table.add_value("n_dofs", result.n_dofs)
    table.add_value("n_levels", result.n_levels)
    table.add_value("n_iterations", result.n_iterations)
    table.add_value("converged", result.converged)
    table.add_value("time", result.time)
    table.add_value("time_cg", result.time / max(result.n_iterations, 1))
    table.add_value("throughput", result.throughput)

    profile = getattr(params, "profile_phases", False)
    if profile and result.mg is not None and result.rhs_used is not None:
        from dealii_multigrid_tpu.utils.phases import profile_v_cycle

        level_dtype = api.number_dtype(params.mg_number_type)
        phases = profile_v_cycle(
            result.mg, result.rhs_used.astype(level_dtype), n_reps=2
        )
        for ph, t in sorted(phases.items()):
            table.add_value(f"time_{ph}", t)

    if params.paraview:
        from dealii_multigrid_tpu.utils.vtu import write_vtu

        u_full = problem.full_solution(result.x)
        write_vtu("solution.vtu", problem.dofh, np.asarray(u_full))

    if params.verbose and params.type in ("PMG", "HMG-global", "HPMG"):
        import jax

        n_shards = max(len(jax.devices()), 1)
        stats = metrics.multigrid_statistics(
            [lv.mesh for lv in levels], n_shards, params.fe_degree_fine
        )
        for k, v in stats.items():
            table.add_value(k, v)

    if params.simulation_type == "Gaussian":
        u = problem.full_solution(result.x)
        table.add_value("l2_error", float(poisson.l2_error(problem, u)))


def main(argv: list[str] | None = None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    if not argv:
        print("usage: python -m dealii_multigrid_tpu.cli input_0001.json [...]")
        return 1
    configs = [RunParameters.parse(path) for path in argv]
    if any(p.number_type in ("double", "mixed") or p.mg_number_type == "double"
           for p in configs):
        import jax

        jax.config.update("jax_enable_x64", True)
    table = ConvergenceTable()
    # exceptions print and abort with a nonzero exit, mirroring the
    # reference's try/catch in main (multigrid_throughput.cc:2444-2468)
    try:
        for params in configs:
            run_config(params, table)
            table.write_text()
    except Exception as exc:  # noqa: BLE001
        print(f"error: {type(exc).__name__}: {exc}", file=__import__("sys").stderr)
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
