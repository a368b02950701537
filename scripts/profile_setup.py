"""Break down the end-to-end setup + solve cost of the bench config.

Times every host/compile phase of solve_with_global_coarsening_hybrid
separately (mesh, per-level dof/hanging/format/operator/diagonal/eig,
transfers, coarse solver, RHS, warm-up compile, timed solve).

Usage: python scripts/profile_setup.py [r] [p]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


class T:
    def __init__(self):
        self.t0 = time.perf_counter()
        self.acc = {}

    def lap(self, name):
        t = time.perf_counter()
        self.acc[name] = self.acc.get(name, 0.0) + (t - self.t0)
        self.t0 = t


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
    from dealii_multigrid_tpu.ops import hybrid as hy
    from dealii_multigrid_tpu.ops.operator import compute_diagonal, make_operator
    from dealii_multigrid_tpu.solvers.chebyshev import ChebyshevSmoother
    from dealii_multigrid_tpu.solvers.multigrid import PreconditionMG
    from dealii_multigrid_tpu.utils.params import MultigridParameters

    t = T()
    mesh = generators.create("quadrant", 3, r, 0)
    t.lap("mesh")
    tri_seq = geometric_coarsening_sequence(mesh)
    t.lap("coarsening_seq")
    plan = api.gc_level_plan("HMG-global", tri_seq, p)

    levels = []
    for m, d in plan:
        dofh = distribute_dofs(m, d)
        t.lap("distribute_dofs")
        hanging = make_hanging_node_constraints(dofh)
        t.lap("hanging")
        fmt = hy.build_hybrid_format(dofh, K=8)
        t.lap("format")
        op = hy.make_hybrid_operator(fmt, hanging, dtype=jnp.float32)
        t.lap("operator(sf)")
        diag = compute_diagonal(dofh, hanging)
        t.lap("diagonal")
        inv_diag = jnp.asarray(fmt.from_global(1.0 / diag), jnp.float32)
        rng = np.random.default_rng(42)
        b0 = jnp.asarray(fmt.from_global(rng.standard_normal(dofh.n_dofs)), jnp.float32)
        t.lap("to_device")
        levels.append(
            api.HybridLevel(
                mesh=m, degree=d, dofh=dofh, hanging=hanging, fmt=fmt, op=op,
                inv_diag=inv_diag, eig_b0=b0,
                from_global_idx=jnp.asarray(fmt.slot_dof, jnp.int32),
                to_global_idx=jnp.asarray(fmt.rep_slot, jnp.int32),
            )
        )
    fine = levels[-1]
    print(f"levels={len(levels)} n_dofs={fine.dofh.n_dofs}")

    mg_data = MultigridParameters()
    mg_data.smoother.degree = 3
    mg_data.coarse_solver.type = "amg"

    # transfers
    from dealii_multigrid_tpu.ops import hybrid_transfer as hyt
    transfers = [None]
    for l in range(1, len(levels)):
        transfers.append(
            hyt.make_hybrid_transfer(
                levels[l].fmt, levels[l - 1].fmt, levels[l].op, levels[l - 1].op,
                dtype=jnp.float32,
            )
        )
    t.lap("transfers")
    smoothers = [None]
    for l in range(1, len(levels)):
        smoothers.append(
            ChebyshevSmoother.create(
                levels[l].op, levels[l].inv_diag,
                degree=mg_data.smoother.degree,
                smoothing_range=mg_data.smoother.smoothing_range,
                eig_cg_n_iterations=mg_data.smoother.eig_cg_n_iterations,
                use_op_dot=True, b0=levels[l].eig_b0,
            )
        )
    t.lap("eig_estimation")
    coarse = api._hybrid_coarse_solver("amg", levels[0], mg_data, jnp.float32)
    t.lap("coarse_solver")

    from dealii_multigrid_tpu.solvers.multigrid import Multigrid
    mg = Multigrid(
        operators=[lv.op for lv in levels], smoothers=smoothers,
        transfers=transfers, coarse_solve=coarse, n_cycles=1,
    )
    precond = PreconditionMG(mg, jnp.float32)

    # RHS via the gather engine (current api.py path)
    fine_gop = make_operator(fine.dofh, fine.hanging, dtype=jnp.float32)
    t.lap("fine_gather_op")
    problem = poisson.make_problem(fine.dofh, fine.hanging, fine_gop, "Constant")
    float(problem.rhs[0])
    t.lap("rhs_gather")
    rhs_slots = jnp.asarray(
        fine.fmt.from_global(np.asarray(problem.rhs, np.float64)), jnp.float32
    )
    t.lap("rhs_convert")

    result = api.mg_solve(
        fine.op, rhs_slots, precond, mg_data, n_levels=len(levels),
        dot=True, n_dofs=fine.dofh.n_dofs,
    )
    t.lap("warmup+solve")
    print(f"iters={result.n_iterations} converged={result.converged} "
          f"solve={result.time:.3f}s throughput={result.throughput/1e6:.1f} MDoF/s")
    total = sum(t.acc.values())
    for k, v in sorted(t.acc.items(), key=lambda kv: -kv[1]):
        print(f"{k:18s} {v:8.2f} s  {100*v/total:5.1f}%")
    print(f"{'TOTAL':18s} {total:8.2f} s")


if __name__ == "__main__":
    main()
