"""Solver assembly layer: build multigrid hierarchies and run benchmarked solves.

Capability mirror of the reference's L5 layer — run() /
solve_with_global_coarsening / solve_with_amg / mg_solve
(reference: multigrid_throughput.cc:817-2396) — re-shaped for TPU: every level
is a set of static device arrays; the whole preconditioned CG solve is one
jitted XLA computation; timing fences use block_until_ready instead of
MPI_Barrier.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from .mesh import generators
from .mesh.coarsening import (
    geometric_coarsening_sequence,
    polynomial_coarsening_sequence,
)
from .mesh.dof import Constraints, DoFHandler, distribute_dofs, make_hanging_node_constraints
from .mesh.octree import AdaptiveMesh
from .models import poisson
from .ops.operator import LaplaceOperator, compute_diagonal, make_operator
from .ops.transfer import TwoLevelTransfer, make_two_level_transfer
from .solvers.cg import cg_solve
from .solvers.chebyshev import ChebyshevSmoother, estimate_eigenvalue_ranges
from .solvers.coarse import make_coarse_solver
from .solvers.multigrid import Multigrid, PreconditionMG
from .utils.flags import gc_chain_k as _gc_chain_k, ls_chain_k as _ls_chain_k
from .utils.params import MultigridParameters, RunParameters
from .utils.device import to_device

_DTYPES = {
    "float": jnp.float32,
    "double": jnp.float64,
    "bfloat16": jnp.bfloat16,
    # TPU-native extension: f64 Krylov vectors and dot products around an f32
    # operator application (v5e has no native f64 matmul path; this recovers
    # the double-outer iteration counts at f32 compute cost)
    "mixed": jnp.float64,
    # TPU-native extension: double-single (f32x2) compensated outer Krylov
    # vectors around the f32 operator — the same precision boundary as
    # "mixed" with NO emulated f64 on the device (solvers/twofloat.py);
    # vectors round to f32 at the API surface
    "df32": jnp.float32,
}


def number_dtype(name: str):
    return _DTYPES[name]


@dataclass(frozen=True)
class MixedPrecisionOperator:
    """f64-in/f64-out wrapper applying the operator in its native (f32)
    precision; dots run in f64."""

    op: object

    def vmult(self, x: jax.Array) -> jax.Array:
        return self.op.vmult(x.astype(self.op.dtype)).astype(jnp.float64)

    def dot(self, x: jax.Array, y: jax.Array) -> jax.Array:
        if hasattr(self.op, "owner"):
            return jnp.vdot(x * self.op.owner.astype(x.dtype), y)
        return jnp.vdot(x, y)

    @property
    def dtype(self):
        return jnp.float64


jax.tree_util.register_dataclass(
    MixedPrecisionOperator, data_fields=["op"], meta_fields=[]
)


@dataclass
class LevelContext:
    """One multigrid level: mesh + degree + operator + smoother data."""

    mesh: AdaptiveMesh
    degree: int
    dofh: DoFHandler
    hanging: Constraints
    op: LaplaceOperator
    inv_diag: jax.Array


def build_level(mesh: AdaptiveMesh, degree: int, dtype) -> LevelContext:
    dofh = distribute_dofs(mesh, degree)
    hanging = make_hanging_node_constraints(dofh)
    op = make_operator(dofh, hanging, dtype=dtype)
    inv_diag = to_device(1.0 / compute_diagonal(dofh, hanging), dtype=dtype)
    return LevelContext(mesh, degree, dofh, hanging, op, inv_diag)


def gc_level_plan(
    mg_type: str,
    tri_sequence: list[AdaptiveMesh],
    degree_fine: int,
) -> list[tuple[AdaptiveMesh, int]]:
    """(mesh, degree) per level, coarsest first — the reference's per-level
    tria/degree selection (multigrid_throughput.cc:1546-1576)."""
    degrees = polynomial_coarsening_sequence(degree_fine, "bisect")
    n_tria = len(tri_sequence)
    if mg_type == "PMG":
        return [(tri_sequence[-1], d) for d in degrees]
    if mg_type == "HMG-global":
        return [(t, degree_fine) for t in tri_sequence]
    if mg_type == "HPMG":
        n_levels = len(degrees) + n_tria - 1
        plan = []
        for l in range(n_levels):
            tria = tri_sequence[min(l, n_tria - 1)]
            degree = degrees[max(0, l - n_tria + 1)]
            plan.append((tria, degree))
        return plan
    raise ValueError(f"unknown global-coarsening type {mg_type!r}")


@dataclass
class MGSolveResult:
    x: jax.Array
    n_iterations: int
    converged: bool
    time: float
    time_per_rep: list
    throughput: float
    n_dofs: int
    n_levels: int
    residual_norm: float
    mg: object | None = None       # the preconditioner (for phase profiling)
    rhs_used: jax.Array | None = None
    n_shards: int = 1
    sub_comm_size: int = 1         # coarsest level's device count (analog of
                                   # the reference's sub_comm_size column)
    partitions: list | None = None # per-level cell->shard maps actually used


def build_gc_preconditioner(
    levels: list[LevelContext],
    mg_data: MultigridParameters,
    outer_dtype,
    level_dtype,
) -> tuple[Multigrid, list[TwoLevelTransfer]]:
    transfers: list = [None]
    for l in range(1, len(levels)):
        transfers.append(
            make_two_level_transfer(
                levels[l].dofh,
                levels[l - 1].dofh,
                levels[l].op,
                levels[l - 1].op,
                dtype=level_dtype,
            )
        )
    # batched eigenvalue estimation: one compile for all levels (chebyshev.py)
    ranges = estimate_eigenvalue_ranges(
        [levels[l].op for l in range(1, len(levels))],
        [levels[l].inv_diag for l in range(1, len(levels))],
        [None] * (len(levels) - 1),
        n_iterations=mg_data.smoother.eig_cg_n_iterations,
    )
    smoothers: list = [None]
    for l in range(1, len(levels)):
        smoothers.append(
            ChebyshevSmoother.create(
                levels[l].op,
                levels[l].inv_diag,
                degree=mg_data.smoother.degree,
                smoothing_range=mg_data.smoother.smoothing_range,
                max_eigenvalue=1.2 * ranges[l - 1][0],  # deal.II safety factor
            )
        )
    coarse = make_coarse_solver(
        mg_data.coarse_solver.type,
        levels[0].op,
        levels[0].dofh,
        levels[0].hanging,
        inv_diag=levels[0].inv_diag,
        mg_data=mg_data,
        dtype=level_dtype,
    )
    mg = Multigrid(
        operators=[lv.op for lv in levels],
        smoothers=smoothers,
        transfers=transfers,
        coarse_solve=coarse,
        n_cycles=1,
    )
    return mg, transfers


def mg_solve(
    fine_op: LaplaceOperator,
    rhs: jax.Array,
    preconditioner,
    mg_data: MultigridParameters,
    n_levels: int,
    warmup: bool = True,
    dot=None,  # truthy => use fine_op.dot (ownership-masked)
    n_dofs: int | None = None,
    host_loop: bool = False,
    df32: bool = False,
    chain: int = 0,
) -> MGSolveResult:
    """Warm-up solve + best-of-n_repetitions timed CG, the reference's
    benchmark protocol (multigrid_throughput.cc:1140-1268).

    ``host_loop`` runs the CG iteration as a host loop over ONE jitted
    step per iteration instead of a single lax.while_loop program.  This
    works around an XLA-TPU miscompilation observed on the axon backend:
    at quadrant r=6/p=4 the local-smoothing V-cycle inside a while_loop
    (or any multi-iteration program) produces inconsistent (x, r) state —
    the loop's residual and ||b - A x|| diverge — while every M/A
    composition is bit-exact when compiled one application per program
    (measured; CPU agrees with the single-application results everywhere).
    The cost is one dispatch per CG iteration.

    ``chain=k0`` (host_loop off, non-df32) runs the CG as a chunked
    unrolled chain instead of the lax.while_loop: the first k0 iterations
    are ONE program with the convergence test masked in, leftovers one
    per dispatch (solvers/cg.py::cg_solve_chain).  Measured round-4c: the
    while_loop pays ~170 ms fixed over the identical chain at bench
    scale.  The multi-iteration miscompile guard below still applies."""
    ctrl = (
        mg_data.cg_parameter_study if mg_data.do_parameter_study else mg_data.cg_normal
    )
    use_op_dot = dot is not None

    if df32:
        # double-single outer vectors (NumberType=df32): rhs is a twofloat.TF
        # pair; the operator and preconditioner apply in plain f32
        from .solvers import twofloat as _tf

        _force = (
            mg_data.cg_parameter_study.maxiter
            if mg_data.do_parameter_study
            else None
        )
        if host_loop:

            def solve(fop, precond, b):
                return _tf.cg_solve_host_df32(
                    fop,
                    b,
                    preconditioner=precond,
                    maxiter=ctrl.maxiter,
                    abstol=ctrl.abstol,
                    reltol=ctrl.reltol,
                    force_iterations=_force,
                    use_weight=use_op_dot,
                )
        elif chain:

            def solve(fop, precond, b):
                return _tf.cg_solve_chain_df32(
                    fop,
                    b,
                    preconditioner=precond,
                    maxiter=ctrl.maxiter,
                    abstol=ctrl.abstol,
                    reltol=ctrl.reltol,
                    force_iterations=_force,
                    use_weight=use_op_dot,
                    k0=chain,
                )
        else:

            @jax.jit
            def solve(fop, precond, b):
                return _tf.cg_solve_df32(
                    fop.vmult,
                    b,
                    preconditioner=precond.vmult,
                    maxiter=ctrl.maxiter,
                    abstol=ctrl.abstol,
                    reltol=ctrl.reltol,
                    force_iterations=_force,
                    weight=fop.owner if use_op_dot else None,
                )

    elif host_loop:
        from .solvers.cg import cg_solve_host

        def solve(fop, precond, b):
            return cg_solve_host(
                fop,
                b,
                preconditioner=precond,
                maxiter=ctrl.maxiter,
                abstol=ctrl.abstol,
                reltol=ctrl.reltol,
                force_iterations=(
                    mg_data.cg_parameter_study.maxiter
                    if mg_data.do_parameter_study
                    else None
                ),
                use_op_dot=use_op_dot,
            )
    elif chain:
        from .solvers.cg import cg_solve_chain

        def solve(fop, precond, b):
            return cg_solve_chain(
                fop,
                b,
                preconditioner=precond,
                maxiter=ctrl.maxiter,
                abstol=ctrl.abstol,
                reltol=ctrl.reltol,
                force_iterations=(
                    mg_data.cg_parameter_study.maxiter
                    if mg_data.do_parameter_study
                    else None
                ),
                use_op_dot=use_op_dot,
                k0=chain,
            )
    else:
        # operators/preconditioner are jit ARGUMENTS (pytrees): their index
        # tables stay runtime parameters, keeping the HLO small (DESIGN.md).
        @jax.jit
        def solve(fop, precond, b):
            return cg_solve(
                fop.vmult,
                b,
                preconditioner=precond.vmult,
                maxiter=ctrl.maxiter,
                abstol=ctrl.abstol,
                reltol=ctrl.reltol,
                force_iterations=(
                    mg_data.cg_parameter_study.maxiter
                    if mg_data.do_parameter_study
                    else None
                ),
                dot=fop.dot if use_op_dot else None,
            )

    def fence(r):
        # the axon TPU plugin's block_until_ready is unreliable; a host
        # transfer of a scalar result is a true execution fence
        float(r.residual_norm)
        return r

    res = fence(solve(fine_op, preconditioner, rhs))  # warm-up (compile + run)
    times = []
    reps = mg_data.n_repetitions if warmup else 1
    for _ in range(reps):
        t0 = time.perf_counter()
        res = fence(solve(fine_op, preconditioner, rhs))
        times.append(time.perf_counter() - t0)
    best = min(times)
    n_it = int(res.n_iterations)
    if not host_loop:
        # miscompile guard: the axon XLA backend has been observed to compute
        # inconsistent loop state inside large multi-iteration while_loop
        # programs (see docstring).  Single-application programs are bit-exact,
        # so recompute ||b - A x|| in its own program and require agreement
        # with the loop's residual.  Runs once, outside the timed loop.
        if df32:
            from .solvers import twofloat as _tf

            @jax.jit
            def _true_residual(fop, b, x):
                ax = fop.vmult(_tf.tf_round(x))
                r = _tf.tf_axpy_f32(jnp.float32(-1.0), ax, b)
                return _tf.tf_norm(r, fop.owner if use_op_dot else None)

        else:

            @jax.jit
            def _true_residual(fop, b, x):
                r = b - fop.vmult(x)
                d = fop.dot if use_op_dot else (lambda a, c: jnp.sum(a * c))
                return jnp.sqrt(d(r, r).real)

        loop_res = float(res.residual_norm)
        true_res = float(_true_residual(fine_op, rhs, res.x))
        norm_b = float(res.norm0)  # ||r0|| computed inside the solve program
        # the attainable TRUE residual is floored by the precision the
        # OPERATOR applies in (f32 for float/mixed/df32): below
        # ~eps_op * ||A|| * ||x|| the recursion keeps contracting while
        # ||b - A x|| stalls — expected mixed-precision CG behaviour, not a
        # miscompile.  Flag only when the true residual misses the claimed
        # convergence by 10x BEYOND that floor allowance.
        inner_op = getattr(fine_op, "op", fine_op)
        eps_op = float(jnp.finfo(getattr(inner_op, "dtype", jnp.float32)).eps)
        floor = 1e4 * eps_op * norm_b
        tol_abs = max(ctrl.abstol, ctrl.reltol * norm_b)
        threshold = 10.0 * max(tol_abs, loop_res) + floor
        if not mg_data.do_parameter_study and true_res > threshold:
            raise RuntimeError(
                "while-loop residual disagrees with the recomputed residual "
                f"(loop {loop_res:.3e} vs true {true_res:.3e}, "
                f"||b|| {norm_b:.3e}, allowance {threshold:.3e}): suspected "
                "axon XLA while-loop miscompilation — rerun with "
                "mg_solve(host_loop=True) (one jitted PCG step per iteration)"
            )
    if n_dofs is None:
        n_dofs = rhs.shape[0] if not df32 else rhs.hi.shape[0]
    if df32:
        # round the double-single pair at the API surface (output rounding
        # adds ~6e-8 relative — far below the f32 matvec floor)
        from .solvers import twofloat as _tf

        res = res._replace(x=_tf.tf_round(res.x))
    return MGSolveResult(
        x=res.x,
        n_iterations=n_it,
        converged=bool(res.converged),
        time=best,
        time_per_rep=times,
        throughput=n_dofs * n_it / best if best > 0 else 0.0,
        n_dofs=n_dofs,
        n_levels=n_levels,
        residual_norm=float(res.residual_norm),
    )


def solve_with_global_coarsening(
    params: RunParameters,
    fine_mesh: AdaptiveMesh,
    fine_level: LevelContext | None = None,
):
    """End-to-end PMG / HMG-global / HPMG solve (reference:
    multigrid_throughput.cc:1443-1666).  Returns (result, problem, levels)."""
    if params.number_type == "df32":
        raise ValueError(
            "NumberType=df32 (double-single outer CG) is implemented on the "
            "hybrid engine (3D); use NumberType=mixed on the gather engine"
        )
    outer_dtype = number_dtype(params.number_type)
    level_dtype = number_dtype(params.mg_number_type)

    tri_seq = geometric_coarsening_sequence(
        fine_mesh, params.min_level, params.min_n_cells
    )
    plan = gc_level_plan(params.type, tri_seq, params.fe_degree_fine)

    levels = []
    for mesh, degree in plan:
        if (
            fine_level is not None
            and mesh is plan[-1][0]
            and degree == params.fe_degree_fine
            and level_dtype == outer_dtype
        ):
            levels.append(fine_level)
        else:
            levels.append(build_level(mesh, degree, level_dtype))

    # outer (Number-precision) fine operator + problem
    if fine_level is not None and level_dtype == outer_dtype:
        fine = fine_level
    else:
        fine = build_level(plan[-1][0], params.fe_degree_fine, outer_dtype)
    problem = poisson.make_problem(
        fine.dofh, fine.hanging, fine.op, params.simulation_type
    )

    mg, _ = build_gc_preconditioner(
        levels, params.mg_data, outer_dtype, level_dtype
    )
    precond = PreconditionMG(mg, outer_dtype)
    result = mg_solve(
        fine.op, problem.rhs, precond, params.mg_data, n_levels=len(levels)
    )
    return result, problem, levels


def solve_with_amg(params: RunParameters, fine_mesh: AdaptiveMesh):
    """Single-level solve with an algebraic preconditioner (reference:
    solve_with_amg, multigrid_throughput.cc:1877-1966).  Here: CG
    preconditioned by the direct/algebraic coarse solver on the fine level."""
    if params.number_type == "df32":
        raise ValueError(
            "NumberType=df32 is implemented on the hybrid engine solves; "
            "use NumberType=mixed for AMG"
        )
    outer_dtype = number_dtype(params.number_type)
    fine = build_level(fine_mesh, params.fe_degree_fine, outer_dtype)
    problem = poisson.make_problem(
        fine.dofh, fine.hanging, fine.op, params.simulation_type
    )
    # AMGPETSc selects the second, BoomerAMG-parameterized algebraic
    # flavour (strong threshold 0.5, aggressive coarsening — amg.py::
    # build_amg_boomer); AMG the Trilinos-ML-default analog
    kind = "amg_petsc" if params.type == "AMGPETSc" else "amg"
    solver = make_coarse_solver(
        kind, fine.op, fine.dofh, fine.hanging,
        mg_data=params.mg_data, dtype=outer_dtype,
    )
    result = mg_solve(fine.op, problem.rhs, solver, params.mg_data, n_levels=1)
    return result, problem, [fine]


def run(params: RunParameters):
    """Reference run<dim,...>() equivalent: build mesh, dispatch solver
    (multigrid_throughput.cc:2019-2396)."""
    mesh = generators.create(
        params.geometry_type, params.dim, params.n_ref_global, params.n_ref_local
    )
    return dispatch_solve(params, mesh)


def dispatch_solve(params: RunParameters, mesh: AdaptiveMesh):
    """Single dispatch point for all solver types (used by run() and cli.py):
    the reference's type switch (multigrid_throughput.cc:2337-2353)."""
    from .ops.hybrid import sanitizer_enabled

    if sanitizer_enabled():
        # routine sanitizer mode (MGTPU_DEBUG=1): NaN provenance on every
        # jitted program for the whole process
        jax.config.update("jax_debug_nans", True)
    if params.type in ("PMG", "HMG-global", "HPMG"):
        # the hybrid patch engine is the production path for 3D; 2D runs on
        # the base gather engine
        if params.dim == 3:
            return solve_with_global_coarsening_hybrid(params, mesh)
        return solve_with_global_coarsening(params, mesh)
    if params.type in ("AMG", "AMGPETSc"):
        return solve_with_amg(params, mesh)
    if params.type in ("HMG-local", "HPMG-local"):
        return solve_with_local_smoothing(params, mesh)
    raise NotImplementedError(f"solver type {params.type!r} not yet implemented")


# ---------------------------------------------------------------------------
# hybrid (patch-structured) engine path — the TPU fast path (see DESIGN.md)
# ---------------------------------------------------------------------------

from dataclasses import dataclass as _dataclass

from .ops import hybrid as _hy
from .ops import hybrid_transfer as _hyt


@_dataclass
class HybridLevel:
    mesh: AdaptiveMesh
    degree: int
    dofh: DoFHandler
    hanging: Constraints
    fmt: "_hy.HybridFormat"
    op: "_hy.HybridOperator"
    inv_diag: jax.Array          # slot layout
    eig_b0: jax.Array            # consistent random vector for eig estimation
    from_global_idx: jax.Array   # i32 [n_slots]
    to_global_idx: jax.Array     # i32 [n_dofs]

    def from_global(self, u: jax.Array) -> jax.Array:
        # dummy slots carry the sentinel dof id n_dofs -> read exact zero
        return jnp.concatenate([u, jnp.zeros(1, u.dtype)])[self.from_global_idx]

    def to_global(self, flat: jax.Array) -> jax.Array:
        return flat[self.to_global_idx]


def build_level_hybrid(
    mesh: AdaptiveMesh,
    degree: int,
    dtype,
    K: int = 8,
    n_shards: int = 1,
    cell_shard: np.ndarray | None = None,
) -> HybridLevel:
    dofh = distribute_dofs(mesh, degree)
    hanging = make_hanging_node_constraints(dofh)
    fmt = _hy.build_hybrid_format(dofh, K=K)
    if n_shards > 1 or cell_shard is not None:
        fmt = _hy.repartition_format(fmt, n_shards, cell_shard)
    if _hy.sanitizer_enabled():
        _hy.verify_format(fmt)
    op = _hy.make_hybrid_operator(fmt, hanging, dtype=dtype)
    diag = compute_diagonal(dofh, hanging)
    inv_diag = to_device(fmt.from_global(1.0 / diag), dtype=dtype)
    rng = np.random.default_rng(42)
    b0 = to_device(
        fmt.from_global(rng.standard_normal(dofh.n_dofs)), dtype=dtype
    )
    return HybridLevel(
        mesh=mesh,
        degree=degree,
        dofh=dofh,
        hanging=hanging,
        fmt=fmt,
        op=op,
        inv_diag=inv_diag,
        eig_b0=b0,
        from_global_idx=to_device(fmt.slot_dof, jnp.int32),
        to_global_idx=to_device(fmt.rep_slot, jnp.int32),
    )


def choose_level_ks(
    plan: list[tuple[AdaptiveMesh, int]], target: int | None = None
) -> list[int]:
    """Per-level patch size K for a (mesh, degree) level plan.

    Lane-density rule (RESULTS.md round-4): the tv pipeline only pays when
    the patch count fills the 128 lanes, so each level halves K until it has
    >= ``target`` patches.  Constraints: the hybrid transfer supports
    K_coarse in {K_fine, K_fine/2} only (walk finest -> coarsest, candidates
    limited to the next-finer level's choice), p-transfer levels share the
    mesh and therefore the choice (the patch scan depends on the mesh only),
    and K floors at 2 (K=1 is the singleton-only layout).  target=0/None
    keeps the uniform default K=8."""
    if target is None:
        from .utils.flags import kadapt_target

        target = kadapt_target()
    n = len(plan)
    ks = [8] * n
    if not target:
        return ks
    memo: dict = {}

    def npatches(mesh, K):
        key = (id(mesh), K)
        if key not in memo:
            memo[key] = len(_hy._find_patches(mesh, K)[0])
        return memo[key]

    prev = None
    for li in range(n - 1, -1, -1):
        mesh = plan[li][0]
        cands = [8, 4, 2] if prev is None else [prev, prev // 2]
        cands = [k for k in cands if k >= 2]
        pick = cands[0]
        for k in cands:
            if npatches(mesh, k) >= target:
                pick = k
                break
        ks[li] = pick
        prev = pick
    return ks


def _hybrid_coarse_solver(kind: str, level: HybridLevel, mg_data, dtype):
    from .solvers.coarse import make_algebraic_solver, make_cg_coarse_solver

    op = level.op
    if kind in ("amg", "amg_petsc", "direct", "cg_with_amg"):
        direct = make_algebraic_solver(
            level.dofh, level.hanging, dtype, mg_data,
            force_direct=(kind == "direct"),
            to_idx=level.to_global_idx, from_idx=level.from_global_idx,
            flavor="boomer" if kind == "amg_petsc" else "sa",
        )
        if kind != "cg_with_amg":
            return direct
        prec = direct
    elif kind == "cg_with_chebyshev":
        prec = ChebyshevSmoother.create(
            op, level.inv_diag,
            degree=mg_data.smoother.degree if mg_data else 5,
            smoothing_range=mg_data.smoother.smoothing_range if mg_data else 20.0,
            eig_cg_n_iterations=mg_data.smoother.eig_cg_n_iterations if mg_data else 20,
            use_op_dot=True,
            b0=level.eig_b0,
        )
    else:
        prec = None
    maxiter = mg_data.coarse_solver.maxiter if mg_data else 10000
    abstol = mg_data.coarse_solver.abstol if mg_data else 1e-20
    reltol = mg_data.coarse_solver.reltol if mg_data else 1e-4
    return make_cg_coarse_solver(op, prec, maxiter, abstol, reltol, use_op_dot=True)


def _eig_cache_key(tag, meshes, degrees, n_slots_list, n_iterations, dtype):
    """Deterministic fingerprint of an eigenvalue-estimation problem: the
    level meshes (cell sets), degrees, slot layouts, CG depth and dtype."""
    import hashlib

    from .mesh.octree import morton_encode

    h = hashlib.sha1()
    # v2: per-degree extrapolation representatives (ADVICE r3) change the
    # extrapolated values for hybrid (PMG/HPMG) plans
    h.update(f"{tag}|it{n_iterations}|{jnp.dtype(dtype).name}|v2".encode())
    for m, d, ns in zip(meshes, degrees, n_slots_list):
        codes = morton_encode(
            m.anchor << (m.max_level - m.level)[:, None].astype(np.int64)
        )
        chk = int(np.bitwise_xor.reduce(codes)) ^ int(m.level.sum())
        h.update(f"|{m.n_cells},{d},{ns},{chk}".encode())
    return h.hexdigest()


def build_gc_preconditioner_hybrid(
    levels: list[HybridLevel], mg_data: MultigridParameters, level_dtype
) -> Multigrid:
    transfers: list = [None]
    for l in range(1, len(levels)):
        transfers.append(
            _hyt.make_hybrid_transfer(
                levels[l].fmt, levels[l - 1].fmt,
                levels[l].op, levels[l - 1].op, dtype=level_dtype,
            )
        )
    # batched eigenvalue estimation: one compile for all levels (chebyshev.py)
    ranges = estimate_eigenvalue_ranges(
        [levels[l].op for l in range(1, len(levels))],
        [levels[l].inv_diag for l in range(1, len(levels))],
        [levels[l].eig_b0 for l in range(1, len(levels))],
        n_iterations=mg_data.smoother.eig_cg_n_iterations,
        use_op_dot=True,
        # the volume-sized levels are the entire remote-compile cost on the
        # axon backend; their lam_max is extrapolated (chebyshev.py docstring)
        extrapolate_above=(
            2_000_000 if jax.default_backend() != "cpu" else None
        ),
        degrees=[lv.degree for lv in levels[1:]],
        cache_key=_eig_cache_key(
            "gc",
            [lv.mesh for lv in levels[1:]],
            [lv.degree for lv in levels[1:]],
            [lv.op.n_slots for lv in levels[1:]],
            mg_data.smoother.eig_cg_n_iterations,
            level_dtype,
        ),
    )
    smoothers: list = [None]
    for l in range(1, len(levels)):
        smoothers.append(
            ChebyshevSmoother.create(
                levels[l].op,
                levels[l].inv_diag,
                degree=mg_data.smoother.degree,
                smoothing_range=mg_data.smoother.smoothing_range,
                max_eigenvalue=1.2 * ranges[l - 1][0],  # deal.II safety factor
            )
        )
    coarse = _hybrid_coarse_solver(
        mg_data.coarse_solver.type, levels[0], mg_data, level_dtype
    )
    from .utils.flags import variant_flag

    return Multigrid(
        operators=[lv.op for lv in levels],
        smoothers=smoothers,
        transfers=transfers,
        coarse_solve=coarse,
        n_cycles=1,
        use_state=variant_flag(
            "MGTPU_TVCYCLE",
            np=levels[-1].op.NP, ns=levels[-1].op.NS,
        ),
    )


def solve_with_global_coarsening_hybrid(
    params: RunParameters, fine_mesh: AdaptiveMesh
):
    """Hybrid-engine PMG / HMG-global / HPMG solve (TPU fast path).

    With ``params.n_shards`` > 1 (or 0 = all devices) the levels are
    domain-decomposed over a device mesh: per-level Morton patch-block
    partitions (optionally policy-weighted, params.effective_policy_name()),
    replicated coarse levels below the granularity threshold — the reference's
    distributed run (mpirun -np N) analog."""
    outer_dtype = number_dtype(params.number_type)
    level_dtype = number_dtype(params.mg_number_type)

    tri_seq = geometric_coarsening_sequence(
        fine_mesh, params.min_level, params.min_n_cells
    )
    plan = gc_level_plan(params.type, tri_seq, params.fe_degree_fine)

    n_shards = params.n_shards if params.n_shards != 0 else len(jax.devices())
    partitions = None
    dmesh = None
    if n_shards > 1:
        from .parallel import sharding as SH

        dmesh = SH.make_device_mesh(n_shards)
        levels, partitions = SH.build_sharded_hybrid_levels(
            plan, level_dtype, dmesh, n_shards, params.effective_policy_name()
        )
    else:
        level_ks = choose_level_ks(plan)
        levels = [
            build_level_hybrid(mesh, degree, level_dtype, K=k)
            for (mesh, degree), k in zip(plan, level_ks)
        ]
    fine = levels[-1]

    # outer operator: hybrid op in outer precision (same structure)
    if params.number_type == "mixed":
        outer_op = MixedPrecisionOperator(
            fine.op
            if level_dtype == jnp.float32
            else _hy.make_hybrid_operator(fine.fmt, fine.hanging, dtype=jnp.float32)
        )
    elif params.number_type == "df32":
        # double-single outer vectors around the plain f32 operator
        # (solvers/twofloat.py) — no wrapper, the pairs live in the CG
        outer_op = (
            fine.op
            if level_dtype == jnp.float32
            else _hy.make_hybrid_operator(fine.fmt, fine.hanging, dtype=jnp.float32)
        )
    elif outer_dtype == level_dtype:
        outer_op = fine.op
    else:
        outer_op = _hy.make_hybrid_operator(fine.fmt, fine.hanging, dtype=outer_dtype)
    if dmesh is not None and outer_op is not fine.op:
        from .parallel import sharding as SH

        inner = getattr(outer_op, "op", outer_op)
        inner = SH.place_hybrid_op(inner, dmesh)
        outer_op = (
            MixedPrecisionOperator(inner)
            if params.number_type == "mixed"
            else inner
        )

    # problem assembled hybrid-native in the slot layout (no gather-engine
    # operator compile — VERDICT r2 weak #2); the gather op is built for
    # metadata (CLI census, solution distribution) but never compiled
    fine_gop = make_operator(
        fine.dofh, fine.hanging, dtype=outer_dtype, device=False
    )
    df32 = params.number_type == "df32"
    if params.number_type == "mixed":
        # mixed mode promises an f64-accurate RHS around the f32 operator
        rhs_op = _hy.make_hybrid_operator(fine.fmt, fine.hanging, dtype=jnp.float64)
    elif df32 and jax.config.jax_enable_x64:
        # df32 mode keeps f64 OFF the iteration path, but when x64 is
        # available the RHS (one-time setup) is assembled in f64 and split
        # exactly into the double-single pair — the f32 RHS-assembly floor
        # on L2 errors disappears without any f64 in the solve
        rhs_op = _hy.make_hybrid_operator(fine.fmt, fine.hanging, dtype=jnp.float64)
    else:
        rhs_op = getattr(outer_op, "op", outer_op)
    problem, rhs_slots = poisson.assemble_problem_hybrid(
        fine.dofh,
        fine.hanging,
        rhs_op,
        _hy.cell_slot_table(fine.fmt),
        fine.fmt,
        fine_gop,
        params.simulation_type,
    )
    if df32:
        from .solvers import twofloat as _tf

        if rhs_slots.dtype == jnp.float64:
            rhs_slots = _tf.tf_split_f64_host(rhs_slots)
        else:
            rhs_slots = _tf.tf_from_f32(rhs_slots)
    else:
        rhs_slots = rhs_slots.astype(outer_dtype)
    if dmesh is not None and fine.op.n_shards > 1:
        from .parallel import sharding as SH

        if df32:
            rhs_slots = type(rhs_slots)(
                SH.shard_vector(rhs_slots.hi, dmesh),
                SH.shard_vector(rhs_slots.lo, dmesh),
            )
        else:
            rhs_slots = SH.shard_vector(rhs_slots, dmesh)

    mg = build_gc_preconditioner_hybrid(levels, params.mg_data, level_dtype)
    precond = PreconditionMG(mg, outer_dtype)
    result = mg_solve(
        outer_op,
        rhs_slots,
        precond,
        params.mg_data,
        n_levels=len(levels),
        dot=True,  # use the operator's ownership-masked dot
        n_dofs=fine.dofh.n_dofs,
        # opt-in A/B knob: the GC while_loop program does NOT miscompile
        # (unlike LS), but the depth-1-pipelined host loop can beat it if
        # the monolithic program schedules worse (profile_r7's PCG-step vs
        # bench-solve gap)
        host_loop=os.environ.get("MGTPU_GC_HOST_LOOP", "") == "1",
        df32=df32,
        # chunked-chain CG (round-4c: the while_loop pays ~170 ms fixed
        # over the identical unrolled chain on axon; utils/flags.py)
        chain=_gc_chain_k(),
    )
    result.mg = mg
    if df32:
        from .solvers import twofloat as _tf

        result.rhs_used = _tf.tf_round(rhs_slots)
    else:
        result.rhs_used = rhs_slots
    result.n_shards = n_shards
    result.partitions = partitions
    # sub_comm_size analog: device count of the coarsest level (1 = the
    # replicated redundant-compute form of the reference's sub-communicator)
    result.sub_comm_size = levels[0].op.n_shards
    # convert solution back to the global layout for error evaluation
    result.x = fine.to_global(result.x)
    return result, problem, levels


# ---------------------------------------------------------------------------
# local smoothing path (HMG-local / HPMG-local) — reference:
# solve_with_local_smoothing, multigrid_throughput.cc:1670-1873
# ---------------------------------------------------------------------------

from .solvers.local_smoothing import LocalSmoothingMG, build_local_smoothing_mg


@dataclass(frozen=True)
class PreconditionLS:
    """Precision + constrained-subspace wrapper around the LS V-cycle."""

    lsmg: LocalSmoothingMG
    keep: jax.Array          # global mask: 0 on constrained active-mesh DoFs
    outer_dtype: jnp.dtype

    def vmult(self, b: jax.Array) -> jax.Array:
        level_dtype = self.keep.dtype
        x = self.lsmg.vmult(b.astype(level_dtype)) * self.keep
        return x.astype(self.outer_dtype)

    __call__ = vmult


jax.tree_util.register_dataclass(
    PreconditionLS, data_fields=["lsmg", "keep"], meta_fields=["outer_dtype"]
)


def solve_with_local_smoothing(params: RunParameters, fine_mesh: AdaptiveMesh):
    """HMG-local / HPMG-local solve on the active mesh.

    3D runs on the hybrid patch engine (level meshes are uniform-level and
    patch-friendly); 2D uses the gather engine."""
    if params.dim == 3:
        return solve_with_local_smoothing_hybrid(params, fine_mesh)
    if params.number_type == "df32":
        raise ValueError(
            "NumberType=df32 is implemented on the hybrid engine (3D); "
            "use NumberType=mixed in 2D"
        )
    outer_dtype = number_dtype(params.number_type)
    level_dtype = number_dtype(params.mg_number_type)
    p = params.fe_degree_fine

    fine = build_level(fine_mesh, p, outer_dtype)
    problem = poisson.make_problem(
        fine.dofh, fine.hanging, fine.op, params.simulation_type
    )

    def global_keep(level_ctx, dtype):
        k = np.ones(level_ctx.dofh.n_dofs)
        k[np.asarray(level_ctx.op.constrained)] = 0.0
        return to_device(k, dtype)

    if params.type == "HMG-local":
        ls_fine = (
            fine if level_dtype == outer_dtype else build_level(fine_mesh, p, level_dtype)
        )
        lsmg = build_local_smoothing_mg(
            ls_fine.dofh,
            params.mg_data,
            dtype=level_dtype,
            min_level=max(params.min_level, 0),
        )
        precond = PreconditionLS(lsmg, global_keep(ls_fine, level_dtype), outer_dtype)
        n_levels = len(lsmg.levels)
    elif params.type == "HPMG-local":
        # p-levels on the active mesh chained above degree-1 local smoothing
        # (reference: two Multigrid objects with offset,
        # multigrid_throughput.cc:1687-1695, 1833-1847)
        degrees = polynomial_coarsening_sequence(p, "bisect")
        plevels = [
            fine if (d == p and level_dtype == outer_dtype) else build_level(fine_mesh, d, level_dtype)
            for d in degrees
        ]
        lsmg = build_local_smoothing_mg(
            plevels[0].dofh,
            params.mg_data,
            dtype=level_dtype,
            min_level=max(params.min_level, 0),
        )
        ls_precond = PreconditionLS(
            lsmg, global_keep(plevels[0], level_dtype), level_dtype
        )
        mg, _ = build_gc_preconditioner(
            plevels, params.mg_data, outer_dtype, level_dtype
        )
        import dataclasses as _dc

        mg = _dc.replace(mg, coarse_solve=ls_precond)
        precond = PreconditionMG(mg, outer_dtype)
        n_levels = len(degrees) + len(lsmg.levels) - 1
    else:
        raise ValueError(params.type)

    result = mg_solve(
        fine.op, problem.rhs, precond, params.mg_data, n_levels=n_levels
    )
    # attach the preconditioner + rhs so ProfilePhases can reach the LS
    # V-cycle from the CLI (reference connects phase signals for every
    # variant, multigrid_throughput.cc:1152-1234)
    result.mg = precond
    result.rhs_used = problem.rhs
    return result, problem, [fine]


def solve_with_local_smoothing_hybrid(
    params: RunParameters, fine_mesh: AdaptiveMesh
):
    """HMG-local / HPMG-local on the hybrid patch engine (TPU fast path).

    Level meshes are uniform-level (conforming, hanging-free), so every LS
    level is a near-pure patch lattice; the outer CG, the p-levels
    (HPMG-local) and the LS V-cycle all run in hybrid slot layouts
    (reference: solve_with_local_smoothing, multigrid_throughput.cc:1670-1873)."""
    import dataclasses as _dc

    from .solvers.local_smoothing import build_local_smoothing_mg_hybrid

    outer_dtype = number_dtype(params.number_type)
    level_dtype = number_dtype(params.mg_number_type)
    p = params.fe_degree_fine

    n_shards = params.n_shards if params.n_shards != 0 else len(jax.devices())
    dmesh = None
    fine_k = choose_level_ks([(fine_mesh, p)])[0]
    if n_shards > 1:
        from .parallel import sharding as SH

        dmesh = SH.make_device_mesh(n_shards)
        fine = build_level_hybrid(
            fine_mesh, p, level_dtype, K=fine_k,
            n_shards=SH.hybrid_level_shard_count(fine_mesh.n_cells, n_shards),
        )
        fine = SH.place_hybrid_level(fine, dmesh)
    else:
        fine = build_level_hybrid(fine_mesh, p, level_dtype, K=fine_k)
    df32 = params.number_type == "df32"
    if params.number_type == "mixed":
        outer_op = MixedPrecisionOperator(
            fine.op
            if level_dtype == jnp.float32
            else _hy.make_hybrid_operator(fine.fmt, fine.hanging, dtype=jnp.float32)
        )
    elif df32:
        outer_op = (
            fine.op
            if level_dtype == jnp.float32
            else _hy.make_hybrid_operator(fine.fmt, fine.hanging, dtype=jnp.float32)
        )
    elif outer_dtype == level_dtype:
        outer_op = fine.op
    else:
        outer_op = _hy.make_hybrid_operator(fine.fmt, fine.hanging, dtype=outer_dtype)
    if dmesh is not None and outer_op is not fine.op:
        from .parallel import sharding as SH

        inner = getattr(outer_op, "op", outer_op)
        inner = SH.place_hybrid_op(inner, dmesh)
        outer_op = (
            MixedPrecisionOperator(inner)
            if params.number_type == "mixed"
            else inner
        )

    # RHS assembled hybrid-native (no gather-engine compile)
    fine_gop = make_operator(
        fine.dofh, fine.hanging, dtype=outer_dtype, device=False
    )
    if params.number_type == "mixed":
        rhs_op = _hy.make_hybrid_operator(fine.fmt, fine.hanging, dtype=jnp.float64)
    elif df32 and jax.config.jax_enable_x64:
        # setup-time f64 RHS split exactly into the double-single pair
        rhs_op = _hy.make_hybrid_operator(fine.fmt, fine.hanging, dtype=jnp.float64)
    else:
        rhs_op = getattr(outer_op, "op", outer_op)
    problem, rhs_slots = poisson.assemble_problem_hybrid(
        fine.dofh,
        fine.hanging,
        rhs_op,
        _hy.cell_slot_table(fine.fmt),
        fine.fmt,
        fine_gop,
        params.simulation_type,
    )
    if df32:
        from .solvers import twofloat as _tf

        if rhs_slots.dtype == jnp.float64:
            rhs_slots = _tf.tf_split_f64_host(rhs_slots)
        else:
            rhs_slots = _tf.tf_from_f32(rhs_slots)
    else:
        rhs_slots = rhs_slots.astype(outer_dtype)
    if dmesh is not None and fine.op.n_shards > 1:
        from .parallel import sharding as SH

        if df32:
            rhs_slots = type(rhs_slots)(
                SH.shard_vector(rhs_slots.hi, dmesh),
                SH.shard_vector(rhs_slots.lo, dmesh),
            )
        else:
            rhs_slots = SH.shard_vector(rhs_slots, dmesh)

    ls_partitions = None
    if params.type == "HMG-local":
        lsmg, ls_partitions = build_local_smoothing_mg_hybrid(
            fine.dofh, fine.fmt, params.mg_data,
            dtype=level_dtype, min_level=max(params.min_level, 0),
            n_shards=n_shards, dmesh=dmesh, return_partitions=True,
        )
        precond = PreconditionLS(lsmg, fine.op.constrained_keep, outer_dtype)
        n_levels = len(lsmg.levels)
    elif params.type == "HPMG-local":
        degrees = polynomial_coarsening_sequence(p, "bisect")
        if dmesh is not None:
            from .parallel import sharding as SH

            plevels = [
                fine
                if d == p
                else SH.place_hybrid_level(
                    build_level_hybrid(
                        fine_mesh, d, level_dtype, K=fine_k,
                        n_shards=SH.hybrid_level_shard_count(
                            fine_mesh.n_cells, n_shards
                        ),
                    ),
                    dmesh,
                )
                for d in degrees
            ]
        else:
            plevels = [
                fine
                if d == p
                else build_level_hybrid(fine_mesh, d, level_dtype, K=fine_k)
                for d in degrees
            ]
        lsmg, ls_partitions = build_local_smoothing_mg_hybrid(
            plevels[0].dofh, plevels[0].fmt, params.mg_data,
            dtype=level_dtype, min_level=max(params.min_level, 0),
            n_shards=n_shards, dmesh=dmesh, return_partitions=True,
        )
        ls_precond = PreconditionLS(
            lsmg, plevels[0].op.constrained_keep, level_dtype
        )
        mg = build_gc_preconditioner_hybrid(plevels, params.mg_data, level_dtype)
        mg = _dc.replace(mg, coarse_solve=ls_precond)
        precond = PreconditionMG(mg, outer_dtype)
        n_levels = len(degrees) + len(lsmg.levels) - 1
    else:
        raise ValueError(params.type)

    result = mg_solve(
        outer_op,
        rhs_slots,
        precond,
        params.mg_data,
        n_levels=n_levels,
        dot=True,
        n_dofs=fine.dofh.n_dofs,
        # the monolithic while_loop program miscompiles the LS V-cycle on
        # the axon TPU backend at production sizes (see mg_solve
        # docstring), but the chunked unrolled MASKED chain is a different
        # program shape and compiles correctly (TPU-measured, guard clean;
        # flags.py MGTPU_LS_CHAIN) — it replaces the one-jitted-step-per-
        # iteration host loop, shedding ~35 ms/iteration tunnel dispatch
        # (r=6/p=4: 37.6 -> 51.9 MDoF/s).  MGTPU_LS_CHAIN=0 falls back to
        # the host loop on accelerators; MGTPU_LS_MONOLITHIC=1 retries the
        # while_loop.  All attempts are safe: the floor-aware recomputed-
        # residual guard raises on any miscompiled solve.
        host_loop=(
            jax.default_backend() != "cpu"
            and os.environ.get("MGTPU_LS_MONOLITHIC", "") != "1"
            and not _ls_chain_k()
        ),
        chain=(
            0
            if os.environ.get("MGTPU_LS_MONOLITHIC", "") == "1"
            else _ls_chain_k()
        ),
        df32=df32,
    )
    result.mg = precond
    if df32:
        from .solvers import twofloat as _tf

        result.rhs_used = _tf.tf_round(rhs_slots)
    else:
        result.rhs_used = rhs_slots
    result.n_shards = n_shards
    result.partitions = ls_partitions  # per-LEVEL-mesh maps (CLI statistics)
    # sub_comm_size analog: device count of the coarsest LS level
    result.sub_comm_size = lsmg.levels[0].op.n_shards
    result.x = fine.to_global(result.x)
    return result, problem, [fine]
