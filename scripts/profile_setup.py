"""Per-stage wall-clock breakdown of the benchmark setup path.

Mirrors bench.py's solve_with_global_coarsening_hybrid flow but times every
host/compile stage separately.  Usage: python scripts/profile_setup.py [r] [p]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

_T0 = time.perf_counter()
_LAST = [_T0]


def mark(label):
    now = time.perf_counter()
    print(f"{label:42s} {now - _LAST[0]:8.2f} s   (total {now - _T0:7.1f} s)", flush=True)
    _LAST[0] = now


def main():
    r = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    p = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    from dealii_multigrid_tpu import api
    from dealii_multigrid_tpu.mesh import generators
    from dealii_multigrid_tpu.mesh.coarsening import geometric_coarsening_sequence
    from dealii_multigrid_tpu.mesh.dof import (
        distribute_dofs,
        make_hanging_node_constraints,
    )
    from dealii_multigrid_tpu.models import poisson
    from dealii_multigrid_tpu.ops import hybrid as _hy
    from dealii_multigrid_tpu.ops.operator import compute_diagonal, make_operator
    from dealii_multigrid_tpu.solvers.multigrid import PreconditionMG
    from dealii_multigrid_tpu.utils.params import RunParameters
    from dealii_multigrid_tpu.utils.device import to_device

    mark("imports")

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

    mesh = generators.create("quadrant", 3, r, 0)
    mark("mesh generation")
    tri_seq = geometric_coarsening_sequence(mesh)
    mark("coarsening sequence")
    plan = api.gc_level_plan("HMG-global", tri_seq, p)

    levels = []
    for i, (m, d) in enumerate(plan):
        t0 = time.perf_counter()
        dofh = distribute_dofs(m, d)
        t1 = time.perf_counter()
        hanging = make_hanging_node_constraints(dofh)
        t2 = time.perf_counter()
        fmt = _hy.build_hybrid_format(dofh, K=8)
        t3 = time.perf_counter()
        op = _hy.make_hybrid_operator(fmt, hanging, dtype=jnp.float32)
        t4 = time.perf_counter()
        diag = compute_diagonal(dofh, hanging)
        inv_diag = to_device(fmt.from_global(1.0 / diag), dtype=jnp.float32)
        t5 = time.perf_counter()
        rng = np.random.default_rng(42)
        b0 = to_device(fmt.from_global(rng.standard_normal(dofh.n_dofs)), jnp.float32)
        lv = api.HybridLevel(
            mesh=m, degree=d, dofh=dofh, hanging=hanging, fmt=fmt, op=op,
            inv_diag=inv_diag, eig_b0=b0,
            from_global_idx=to_device(fmt.slot_dof, jnp.int32),
            to_global_idx=to_device(fmt.rep_slot, jnp.int32),
        )
        levels.append(lv)
        print(
            f"  level {i}: n_cells={m.n_cells:8d} dofs={t1-t0:6.2f}s "
            f"hang={t2-t1:6.2f}s fmt={t3-t2:6.2f}s op={t4-t3:6.2f}s "
            f"diag={t5-t4:6.2f}s", flush=True,
        )
        _LAST[0] = time.perf_counter()
    mark("ALL level builds")
    fine = levels[-1]

    from dealii_multigrid_tpu.ops import hybrid_transfer as _hyt

    transfers = [None]
    for l in range(1, len(levels)):
        transfers.append(
            _hyt.make_hybrid_transfer(
                levels[l].fmt, levels[l - 1].fmt,
                levels[l].op, levels[l - 1].op, dtype=jnp.float32,
            )
        )
    mark("transfers")

    from dealii_multigrid_tpu.solvers.chebyshev import (
        ChebyshevSmoother,
        estimate_eigenvalue_ranges,
    )

    ranges = estimate_eigenvalue_ranges(
        [lv.op for lv in levels[1:]],
        [lv.inv_diag for lv in levels[1:]],
        [lv.eig_b0 for lv in levels[1:]],
        n_iterations=params.mg_data.smoother.eig_cg_n_iterations,
        use_op_dot=True,
    )
    mark("eigenvalue estimation (batched)")
    smoothers = [None] + [
        ChebyshevSmoother.create(
            lv.op, lv.inv_diag, degree=3,
            smoothing_range=params.mg_data.smoother.smoothing_range,
            max_eigenvalue=1.2 * ranges[i][0],
        )
        for i, lv in enumerate(levels[1:])
    ]
    coarse = api._hybrid_coarse_solver("amg", levels[0], params.mg_data, jnp.float32)
    mark("coarse solver build")

    from dealii_multigrid_tpu.solvers.multigrid import Multigrid

    mg = Multigrid(
        operators=[lv.op for lv in levels], smoothers=smoothers,
        transfers=transfers, coarse_solve=coarse, n_cycles=1,
    )
    precond = PreconditionMG(mg, jnp.float32)

    fine_gop = make_operator(fine.dofh, fine.hanging, dtype=jnp.float32)
    mark("gather-op metadata build")
    problem, rhs_slots = poisson.assemble_problem_hybrid(
        fine.dofh, fine.hanging, fine.op,
        _hy.cell_slot_table(fine.fmt), fine.fmt, fine_gop, "Gaussian",
    )
    mark("RHS assembly (hybrid-native)")

    from dealii_multigrid_tpu.solvers.cg import cg_solve

    ctrl = params.mg_data.cg_normal

    @jax.jit
    def solve(fop, pre, b):
        return cg_solve(
            fop.vmult, b, preconditioner=pre.vmult, maxiter=ctrl.maxiter,
            abstol=ctrl.abstol, reltol=ctrl.reltol, dot=fop.dot,
        )

    rhs32 = rhs_slots.astype(jnp.float32)
    lowered = solve.lower(fine.op, precond, rhs32)
    mark("solve trace+lower")
    compiled = lowered.compile()
    mark("solve compile (cache load if warm)")
    res = compiled(fine.op, precond, rhs32)
    float(res.residual_norm)
    mark("solve first execution")
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        res = compiled(fine.op, precond, rhs32)
        float(res.residual_norm)
        ts.append(time.perf_counter() - t0)
    mark("solve 5 reps")
    import dataclasses as _dc

    class R:
        pass

    result = R()
    result.time = min(ts)
    result.n_iterations = int(res.n_iterations)
    result.throughput = fine.dofh.n_dofs * result.n_iterations / result.time
    result.converged = bool(res.converged)
    print(
        f"\nsolve: {result.time*1e3:.1f} ms, {result.n_iterations} its, "
        f"throughput {result.throughput/1e6:.1f} MDoF/s, "
        f"converged={result.converged}"
    )


if __name__ == "__main__":
    main()
