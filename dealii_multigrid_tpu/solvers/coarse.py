"""Coarse-grid solvers for the multigrid hierarchy.

Mirrors the reference's five coarse-solver variants
(multigrid_throughput.cc:909-1077):
  * "cg"                — CG with identity preconditioner
  * "cg_with_chebyshev" — CG preconditioned by Chebyshev-Jacobi
  * "cg_with_amg"       — CG preconditioned by the algebraic coarse solver
  * "amg"               — algebraic coarse solve, n_cycles applications
  * "amg_petsc"         — second algebraic flavour (alias here)

TPU-first note: the reference's Trilinos-ML / BoomerAMG coarse solves are
host-library black boxes.  On TPU the idiomatic replacement for the (small,
truncated) coarsest problem is a dense Cholesky factorisation computed once at
setup and applied as two triangular solves on device — exact, so CG iteration
counts are at least as good as the reference's 2-cycle AMG coarse solve.  A
native smoothed-aggregation AMG (for very large coarse problems) plugs into
the same interface.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from ..mesh.dof import Constraints, DoFHandler
from ..ops import element
from ..ops.operator import LaplaceOperator, split_boundary_constraints
from .cg import cg_solve
from .chebyshev import ChebyshevSmoother


def assemble_sparse_matrix(
    dofh: DoFHandler, hanging: Constraints, cell_weights=None
) -> sp.csr_matrix:
    """Host-side assembly of the constrained system matrix C^T B C + I_c
    (capability mirror of Operator::get_trilinos_system_matrix,
    reference include/operator.h:244-287).  ``cell_weights`` scales each
    cell's stiffness contribution (piecewise-constant coefficients, e.g.
    viscosity — matches make_operator(cell_weights=...))."""
    mesh, dim, p = dofh.mesh, dofh.dim, dofh.degree
    elem = element.laplace_element_matrix(dim, p)
    scale = mesh.h(mesh.level).astype(np.float64) ** (dim - 2)
    if cell_weights is not None:
        scale = scale * np.asarray(cell_weights, np.float64)
    nloc = dofh.n_loc
    n = dofh.n_dofs
    rows = np.repeat(dofh.cell_dofs.astype(np.int64), nloc, axis=1).reshape(-1)
    cols = np.tile(dofh.cell_dofs.astype(np.int64), (1, nloc)).reshape(-1)
    vals = (scale[:, None, None] * elem[None]).reshape(-1)
    B = sp.csr_matrix((vals, (rows, cols)), shape=(n, n))

    hang, dirichlet = split_boundary_constraints(dofh, hanging)
    constrained = np.zeros(n, dtype=bool)
    constrained[dirichlet] = True
    constrained[hang.slave] = True
    free = ~constrained
    diag_free = sp.diags(free.astype(np.float64))
    C = diag_free.tocsr()
    if len(hang.slave):
        m = hang.masters.reshape(-1)
        w = hang.weights.reshape(-1)
        r = np.repeat(hang.slave, hang.masters.shape[1])
        nz = (w != 0) & ~constrained[m]
        C = C + sp.csr_matrix((w[nz], (r[nz], m[nz])), shape=(n, n))
    A = (C.T @ B @ C).tocsr()
    Ic = sp.diags(constrained.astype(np.float64))
    return (A + Ic).tocsr()


from dataclasses import dataclass
from ..utils.device import to_device


@dataclass(frozen=True)
class DirectCoarseSolver:
    """Dense Cholesky coarse solve (pytree; jit-argument friendly).

    Optional to_idx/from_idx convert hybrid slot vectors to/from the global
    DoF layout around the dense solve.
    """

    L: jax.Array
    to_idx: jax.Array | None = None    # rep slot per dof (slots -> global)
    from_idx: jax.Array | None = None  # slot dof (global -> slots)

    def __call__(self, b: jax.Array) -> jax.Array:
        bg = b[self.to_idx] if self.to_idx is not None else b
        y = jax.scipy.linalg.solve_triangular(self.L, bg.astype(self.L.dtype), lower=True)
        x = jax.scipy.linalg.solve_triangular(self.L.T, y, lower=False)
        x = x.astype(b.dtype)
        if self.from_idx is None:
            return x
        # from_idx may carry the sentinel n_dofs on dummy slots -> read zero
        return jnp.concatenate([x, jnp.zeros(1, x.dtype)])[self.from_idx]

    vmult = __call__


jax.tree_util.register_dataclass(
    DirectCoarseSolver, data_fields=["L", "to_idx", "from_idx"], meta_fields=[]
)


@dataclass(frozen=True)
class CGCoarseSolver:
    """Inner-CG coarse solve with optional preconditioner (pytree).

    Mirrors MGCoarseGridIterativeSolver + ReductionControl
    (reference: multigrid_throughput.cc:909-960).
    """

    op: object
    preconditioner: object | None
    maxiter: int
    abstol: float
    reltol: float
    use_op_dot: bool

    def __call__(self, b: jax.Array) -> jax.Array:
        prec = self.preconditioner.vmult if self.preconditioner is not None else None
        dot = self.op.dot if self.use_op_dot else None
        return cg_solve(
            self.op.vmult, b, preconditioner=prec,
            maxiter=self.maxiter, abstol=self.abstol, reltol=self.reltol, dot=dot,
        ).x

    vmult = __call__


jax.tree_util.register_dataclass(
    CGCoarseSolver,
    data_fields=["op", "preconditioner"],
    meta_fields=["maxiter", "abstol", "reltol", "use_op_dot"],
)


def make_direct_coarse_solver(
    dofh: DoFHandler, hanging: Constraints, dtype=jnp.float32,
    to_idx=None, from_idx=None,
) -> DirectCoarseSolver:
    """Dense Cholesky coarse solver (setup on host, apply on device)."""
    A = assemble_sparse_matrix(dofh, hanging).toarray()
    Lnp = np.linalg.cholesky(A)
    L = to_device(Lnp, dtype=jnp.float32 if dtype == jnp.bfloat16 else dtype)
    return DirectCoarseSolver(L, to_idx, from_idx)


def make_cg_coarse_solver(
    op: LaplaceOperator,
    preconditioner=None,
    maxiter: int = 10000,
    abstol: float = 1e-20,
    reltol: float = 1e-4,
    use_op_dot: bool = False,
) -> CGCoarseSolver:
    return CGCoarseSolver(op, preconditioner, maxiter, abstol, reltol, use_op_dot)


def make_coarse_solver(
    kind: str,
    op: LaplaceOperator,
    dofh: DoFHandler,
    hanging: Constraints,
    inv_diag: jax.Array | None = None,
    mg_data=None,
    dtype=jnp.float32,
) -> Callable:
    """Dispatch on CoarseGridSolverType (reference: multigrid_throughput.cc:909-1077)."""
    maxiter = 10000 if mg_data is None else mg_data.coarse_solver.maxiter
    abstol = 1e-20 if mg_data is None else mg_data.coarse_solver.abstol
    reltol = 1e-4 if mg_data is None else mg_data.coarse_solver.reltol
    if kind == "cg":
        return make_cg_coarse_solver(op, None, maxiter, abstol, reltol)
    if kind == "cg_with_chebyshev":
        smoother = ChebyshevSmoother.create(
            op,
            inv_diag,
            degree=mg_data.smoother.degree if mg_data else 5,
            smoothing_range=mg_data.smoother.smoothing_range if mg_data else 20.0,
            eig_cg_n_iterations=(
                mg_data.smoother.eig_cg_n_iterations if mg_data else 20
            ),
        )
        return make_cg_coarse_solver(op, smoother, maxiter, abstol, reltol)
    if kind in ("amg", "amg_petsc", "direct"):
        return make_algebraic_solver(
            dofh, hanging, dtype, mg_data,
            force_direct=(kind == "direct"),
            flavor="boomer" if kind == "amg_petsc" else "sa",
        )
    if kind == "cg_with_amg":
        alg = make_algebraic_solver(dofh, hanging, dtype, mg_data)
        return make_cg_coarse_solver(op, alg, maxiter, abstol, reltol)
    raise ValueError(f"unknown coarse solver type {kind!r}")


# problems up to this size use the exact dense Cholesky (TPU-idiomatic for
# truncated coarse levels); larger ones get the native smoothed-aggregation
# AMG (solvers/amg.py)
DIRECT_SOLVER_MAX_DOFS = 8000


def make_algebraic_solver(
    dofh: DoFHandler,
    hanging: Constraints,
    dtype=jnp.float32,
    mg_data=None,
    force_direct: bool = False,
    to_idx=None,
    from_idx=None,
    flavor: str = "sa",
):
    if force_direct or dofh.n_dofs <= DIRECT_SOLVER_MAX_DOFS:
        return make_direct_coarse_solver(dofh, hanging, dtype, to_idx, from_idx)
    from .amg import build_amg, build_amg_boomer

    A = assemble_sparse_matrix(dofh, hanging)
    n_cycles = mg_data.coarse_solver.n_cycles if mg_data else 1
    builder = build_amg_boomer if flavor == "boomer" else build_amg
    amg = builder(A, dtype=dtype, n_cycles=n_cycles)
    if to_idx is None:
        return amg
    return SlottedSolver(amg, to_idx, from_idx)


from dataclasses import dataclass as _dc2


@_dc2(frozen=True)
class SlottedSolver:
    """Applies a global-layout solver to hybrid slot vectors."""

    inner: object
    to_idx: jax.Array
    from_idx: jax.Array

    def vmult(self, b: jax.Array) -> jax.Array:
        x = self.inner.vmult(b[self.to_idx])
        # from_idx may carry the sentinel n_dofs on dummy slots -> read zero
        return jnp.concatenate([x, jnp.zeros(1, x.dtype)])[self.from_idx]

    __call__ = vmult


jax.tree_util.register_dataclass(
    SlottedSolver, data_fields=["inner", "to_idx", "from_idx"], meta_fields=[]
)
