"""Variable-viscosity Stokes: the n-sinker benchmark family.

The reference repository points its mantle-convection workload at the
nsinker benchmark (mantle-convection/README.md:1-25 — n high-viscosity
spherical inclusions sinking in a low-viscosity medium); this module makes
it runnable on the framework's own pieces:

  * viscous block: the cellwise-constant-coefficient vector Laplacian —
    ``ops/operator.py::make_operator(cell_weights=eta)`` scales each cell's
    exact stiffness contribution (exact for piecewise-constant viscosity);
  * GMG hierarchy: RE-DISCRETIZED per level — the analytic viscosity field
    is sampled at each level mesh's own cell centers (the standard
    rediscretization approach; no Galerkin triple products needed);
  * Schur approximation: the 1/eta-WEIGHTED pressure mass (spectrally
    equivalent to the Schur complement under variable viscosity,
    Elman/Silvester/Wathen ch. 8), applied by the same fixed-interval
    Chebyshev — the Wathen element-wise eigenvalue bounds [1/8, 27/8] for
    D^{-1} M are weight-invariant (each row's lumped/diagonal ratio is a
    weighted mean of per-element ratios);
  * outer solve: right-preconditioned GMRES with the block upper-triangular
    preconditioner (solvers/gmres.py, models/stokes.py).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import numpy as np
import jax.numpy as jnp
import scipy.sparse as sp

from ..mesh.dof import distribute_dofs, local_node_indices, make_hanging_node_constraints
from ..mesh.octree import AdaptiveMesh
from ..ops import tensor
from ..ops.operator import compute_diagonal, make_operator
from ..ops.vector import VectorOperator
from ..solvers.amg import ELLMatrix
from ..utils.device import to_device
from .stokes import (
    StokesBlockPreconditioner,
    StokesOperator,
    _to_ell,
    assemble_divergence,
    assemble_pressure_mass,
    make_mass_solve,
)


def nsinker_viscosity(
    n_sinkers: int = 4,
    eta_min: float = 1.0,
    eta_max: float = 1e3,
    radius: float = 0.7,
    delta: float = 50.0,
    seed: int = 0,
):
    """Smoothed n-sinker viscosity field on [-1, 1]^3 (the pTatin/May
    benchmark shape): eta = eta_max inside the inclusions, eta_min outside,
    with an exp-smoothed transition of decay rate ``delta``."""
    rng = np.random.default_rng(seed)
    centers = rng.uniform(-0.55, 0.55, size=(n_sinkers, 3))

    def eta(x: np.ndarray) -> np.ndarray:
        x = np.asarray(x, np.float64)
        m = np.ones(x.shape[0])
        for c in centers:
            d = np.linalg.norm(x - c[None, :], axis=1)
            m *= 1.0 - np.exp(-delta * np.maximum(0.0, d - radius / 2.0) ** 2)
        return eta_min * m + eta_max * (1.0 - m)

    eta.centers = centers
    return eta


@dataclass(frozen=True)
class ELLOperator:
    """Scalar level operator from an assembled (Galerkin) sparse matrix —
    the matrix-DEPENDENT coarse-grid component for high-contrast viscosity
    (rediscretized coefficient hierarchies lose the preconditioner at
    contrast >= 1e5; see build_stokes_nsinker(coarsening='galerkin'))."""

    M: ELLMatrix
    n_dofs: int

    @property
    def dtype(self):
        return self.M.vals.dtype

    def vmult(self, x: jax.Array) -> jax.Array:
        return self.M.matvec(x)

    def dot(self, x, y):
        return jnp.sum(x * y)


jax.tree_util.register_dataclass(
    ELLOperator, data_fields=["M"], meta_fields=["n_dofs"]
)


@dataclass(frozen=True)
class SparseTransfer:
    """Level transfer from an assembled prolongation: prolong = P u,
    restrict = P^T r (the exact transpose pair the Galerkin product uses)."""

    P: ELLMatrix   # [n_fine, n_coarse]
    Pt: ELLMatrix  # [n_coarse, n_fine]

    def prolong(self, u: jax.Array) -> jax.Array:
        return self.P.matvec(u)

    def restrict(self, r: jax.Array) -> jax.Array:
        return self.Pt.matvec(r)


jax.tree_util.register_dataclass(
    SparseTransfer, data_fields=["P", "Pt"], meta_fields=[]
)


def assemble_prolongation(dofh_f, dofh_c) -> sp.csr_matrix:
    """Sparse Q_p embedding P [n_fine, n_coarse] between two CONFORMING
    uniform meshes where fine cells 8j..8j+7 are the Morton children of
    coarse cell j (the nsinker hierarchy property, asserted by the caller).

    Dirichlet rows (fine) and columns (coarse) are zeroed — the level
    operators use the identity-on-constrained-rows convention, so boundary
    values neither restrict nor prolongate (deal.II MGConstrainedDoFs
    semantics)."""
    p = dofh_f.degree
    assert dofh_c.degree == p
    mesh_f, mesh_c = dofh_f.mesh, dofh_c.mesh
    nloc = dofh_f.n_loc
    E = tensor.h_embedding_1d(p)               # E[b][i, j] = l_j((x_i+b)/2)
    loc = local_node_indices(3, p)             # [nloc, 3], x fastest
    # W[b][i, j] = prod_d E[b_d][i_d, j_d] for the 8 child positions
    W = np.empty((2, 2, 2, nloc, nloc))
    for bx in range(2):
        for by in range(2):
            for bz in range(2):
                W[bx, by, bz] = (
                    E[bx][loc[:, None, 0], loc[None, :, 0]]
                    * E[by][loc[:, None, 1], loc[None, :, 1]]
                    * E[bz][loc[:, None, 2], loc[None, :, 2]]
                )

    parent = np.arange(mesh_f.n_cells) // 8
    b = np.asarray(mesh_f.anchor) - 2 * np.asarray(mesh_c.anchor)[parent]
    assert b.min() >= 0 and b.max() <= 1, "not a Morton children hierarchy"

    # one interpolation row per fine dof, from its FIRST (cell, node)
    # occurrence (duplicates agree: the embedding is single-valued on
    # conforming meshes)
    flat = dofh_f.cell_dofs.reshape(-1).astype(np.int64)
    _, first = np.unique(flat, return_index=True)
    cell = first // nloc
    node = first % nloc
    rows = flat[first]                                  # == arange(n_dofs)
    masters = dofh_c.cell_dofs[parent[cell]].astype(np.int64)  # [n, nloc]
    weights = W[b[cell, 0], b[cell, 1], b[cell, 2], node]      # [n, nloc]
    # boundary elimination: rows (fine Dirichlet) and columns (coarse
    # Dirichlet)
    weights = np.where(dofh_f.boundary_mask[rows][:, None], 0.0, weights)
    weights = np.where(dofh_c.boundary_mask[masters], 0.0, weights)
    nz = np.abs(weights) > 1e-14
    r_idx = np.repeat(rows, nloc).reshape(-1, nloc)[nz]
    P = sp.csr_matrix(
        (weights[nz], (r_idx, masters[nz])),
        shape=(dofh_f.n_dofs, dofh_c.n_dofs),
    )
    P.sum_duplicates()
    return P


def make_stokes_rebuilder(mesh: AdaptiveMesh, mg_data, dtype=jnp.float64):
    """Geometry setup once, viscosity swap per call: returns
    ``rebuild(eta_fine) -> (op, block_precond)`` for loops whose viscosity
    changes every step (temperature-dependent rheology in the convection
    demo).  All pytree STRUCTURES are identical across calls, so every
    jitted program (solve, eigenvalue estimation) compiles once on the
    first call and is reused for all later viscosity fields."""
    from .. import api
    from ..mesh.coarsening import geometric_coarsening_sequence
    from ..solvers.multigrid import PreconditionMG

    assert mesh.dim == 3
    dofh_v = distribute_dofs(mesh, 2)
    dofh_p = distribute_dofs(mesh, 1)
    assert make_hanging_node_constraints(dofh_v).n_slaves == 0

    tri_seq = geometric_coarsening_sequence(mesh)
    plan = api.gc_level_plan("HMG-global", tri_seq, 2)
    geo = []
    for m, d in plan:
        dofh = distribute_dofs(m, d)
        hanging = make_hanging_node_constraints(dofh)
        geo.append((m, d, dofh, hanging))

    B = assemble_divergence(dofh_v, dofh_p)
    B_ell = _to_ell(B, dtype)
    Bt_ell = _to_ell(B.T.tocsr(), dtype)
    keep1 = np.ones(dofh_v.n_dofs)
    keep1[dofh_v.boundary_mask] = 0.0
    keep_v = to_device(np.tile(keep1, 3), dtype)

    def rebuild(eta_fine: np.ndarray):
        eta_fine = np.asarray(eta_fine, np.float64)
        etas = [eta_fine]
        for _ in range(len(plan) - 1):
            etas.append(etas[-1].reshape(-1, 8).mean(1))
        etas = etas[::-1]
        levels = []
        for (m, d, dofh, hanging), ec in zip(geo, etas):
            op = make_operator(
                dofh, hanging, dtype=dtype, cell_weights=ec
            )
            inv_diag = to_device(
                1.0 / compute_diagonal(dofh, hanging, cell_weights=ec),
                dtype=dtype,
            )
            levels.append(api.LevelContext(m, d, dofh, hanging, op, inv_diag))
        mg, _ = api.build_gc_preconditioner(levels, mg_data, dtype, dtype)
        op = StokesOperator(
            a_op=VectorOperator(levels[-1].op, 3),
            B=B_ell, Bt=Bt_ell, keep_v=keep_v,
            n_v=dofh_v.n_dofs, n_p=dofh_p.n_dofs,
        )
        precond = StokesBlockPreconditioner(
            v_precond=PreconditionMG(mg, dtype),
            p_solve=make_mass_solve(
                assemble_pressure_mass(dofh_p, cell_weights=1.0 / eta_fine),
                dtype,
            ),
            n_v=dofh_v.n_dofs, n_p=dofh_p.n_dofs,
        )
        return op, precond

    rebuild.dofh_v = dofh_v
    rebuild.dofh_p = dofh_p
    return rebuild


@dataclass(frozen=True)
class WBFBTSchurSolve:
    """Scaled BFBT (w-BFBT) Schur approximation:

        S^-1 ~= Kp^-1 (B D^-1 A D^-1 B^T) Kp^-1,   Kp = B D^-1 B^T,

    with D = diag(A) (Rudi/Malossi/Stadler SC16 — the robust Schur
    preconditioner for sharp high-contrast viscosity, where the
    inverse-viscosity-weighted mass loses its spectral equivalence).
    ``kp_solve`` applies an approximate Kp^{-1} (AMG V-cycles; Kp is the
    Neumann pressure Laplacian analog, singular with the constant —
    projected around each application)."""

    kp_solve: object     # vmult: approximate Kp^-1 on [n_p]
    B: ELLMatrix         # [n_p, 3 n_v]
    Bt: ELLMatrix        # [3 n_v, n_p]
    a_op: object         # VectorOperator: [3, n_v] -> [3, n_v]
    dinv: jax.Array      # [3 n_v] = keep / diag(A)
    n_v: int

    def _kp(self, r: jax.Array) -> jax.Array:
        z = self.kp_solve.vmult(r - jnp.mean(r))
        return z - jnp.mean(z)

    def vmult(self, r: jax.Array) -> jax.Array:
        z1 = self._kp(r)
        u = self.Bt.matvec(z1) * self.dinv
        au = self.a_op.vmult(u.reshape(3, self.n_v)).reshape(-1)
        w = self.B.matvec(au * self.dinv)
        return self._kp(w)


jax.tree_util.register_dataclass(
    WBFBTSchurSolve,
    data_fields=["kp_solve", "B", "Bt", "a_op", "dinv"],
    meta_fields=["n_v"],
)


@dataclass(frozen=True)
class KpCGSolve:
    """Fixed-iteration AMG-preconditioned CG on Kp — the inner Poisson
    solve of BFBT.  A plain 2-cycle SA-AMG application is too weak on the
    high-contrast 1/eta-weighted pressure Laplacian (measured r=4 at
    contrast 1e6: outer GMRES 300+ its vs 50 with an exact Kp solve; 16-20
    AMG-CG steps recover the exact-Kp count).  The iteration count is FIXED
    so each application is one static jittable program; the residual-
    dependent CG coefficients make the preconditioner mildly nonlinear —
    pair with restarted GMRES(m<=30-60) and verify_true_residual."""

    amg: object      # 1-cycle AMG preconditioner (vmult)
    Kp: ELLMatrix
    n_it: int

    def vmult(self, r: jax.Array) -> jax.Array:
        from ..solvers.cg import cg_solve

        return cg_solve(
            self.Kp.matvec, r, preconditioner=self.amg.vmult,
            force_iterations=self.n_it,
        ).x


jax.tree_util.register_dataclass(
    KpCGSolve, data_fields=["amg", "Kp"], meta_fields=["n_it"]
)


def make_wbfbt_schur(
    B_csr, a_op, diag_A1: np.ndarray, keep1: np.ndarray, dtype,
    kp_cg_iterations: int = 20,
):
    """Build the w-BFBT Schur solve from the assembled divergence matrix,
    the (matrix-free) velocity operator and the scalar velocity diagonal.

    ``diag_A1`` / ``keep1`` are per scalar component ([n_v]); the vector
    diagonal is the 3-fold tile.  Kp = B D^-1 B^T is assembled on the host;
    its approximate inverse is ``kp_cg_iterations`` of AMG-preconditioned
    CG (see KpCGSolve).  The tiny Tikhonov shift makes the AMG's coarsest
    dense Cholesky well-posed on the singular (Neumann) operator without
    affecting the projected application."""
    from ..solvers.amg import build_amg

    dinv1 = keep1 / np.asarray(diag_A1, np.float64)
    dinv = np.tile(dinv1, 3)
    Kp = (B_csr @ sp.diags(dinv) @ B_csr.T).tocsr()
    shift = 1e-10 * float(np.abs(Kp.diagonal()).max())
    amg = build_amg(
        (Kp + shift * sp.eye(Kp.shape[0])).tocsr(), dtype=dtype, n_cycles=1
    )
    kp_solve = KpCGSolve(amg, _to_ell(Kp, dtype), kp_cg_iterations)
    return WBFBTSchurSolve(
        kp_solve=kp_solve,
        B=_to_ell(B_csr, dtype),
        Bt=_to_ell(B_csr.T.tocsr(), dtype),
        a_op=a_op,
        dinv=to_device(dinv, dtype),
        n_v=len(diag_A1),
    )


def _build_galerkin_velocity_mg(plan, eta_fine_cells, mg_data, dtype):
    """Velocity-block Multigrid with Galerkin coarse operators:
    A_{l-1} = P_l^T A_l P_l from the assembled fine matrix, exact Q2
    embedding transfers, Chebyshev smoothers on the true level diagonals,
    dense-Cholesky coarsest solve.  The finest level stays matrix-free
    (the assembled A_f is only a setup-time artifact)."""
    from ..solvers.chebyshev import ChebyshevSmoother
    from ..solvers.coarse import DirectCoarseSolver, assemble_sparse_matrix
    from ..solvers.multigrid import Multigrid

    L = len(plan)
    dofhs = [distribute_dofs(m, d) for m, d in plan]
    hang_f = make_hanging_node_constraints(dofhs[-1])
    fine_op = make_operator(
        dofhs[-1], hang_f, dtype=dtype, cell_weights=eta_fine_cells
    )
    fine_inv_diag = to_device(
        1.0 / compute_diagonal(dofhs[-1], hang_f, cell_weights=eta_fine_cells),
        dtype=dtype,
    )
    A = assemble_sparse_matrix(dofhs[-1], hang_f, cell_weights=eta_fine_cells)
    mats = [None] * L
    mats[-1] = A
    Ps = [None] * L  # Ps[l]: level l-1 -> l
    for l in range(L - 1, 0, -1):
        P = assemble_prolongation(dofhs[l], dofhs[l - 1])
        Ac = (P.T @ mats[l] @ P).tocsr()
        # identity on coarse constrained rows (their P column is zeroed, so
        # the triple product leaves them empty)
        bnd = dofhs[l - 1].boundary_mask.astype(np.float64)
        Ac = (Ac + sp.diags(bnd)).tocsr()
        d = Ac.diagonal()
        assert (d[~dofhs[l - 1].boundary_mask] > 0).all()
        mats[l - 1] = Ac
        Ps[l] = P

    operators = [
        ELLOperator(_to_ell(mats[l], dtype), dofhs[l].n_dofs)
        for l in range(L - 1)
    ] + [fine_op]
    transfers = [None] + [
        SparseTransfer(_to_ell(Ps[l], dtype), _to_ell(Ps[l].T.tocsr(), dtype))
        for l in range(1, L)
    ]
    smoothers = [None]
    for l in range(1, L):
        inv_diag = (
            fine_inv_diag
            if l == L - 1
            else to_device(1.0 / mats[l].diagonal(), dtype=dtype)
        )
        smoothers.append(
            ChebyshevSmoother.create(
                operators[l],
                inv_diag,
                degree=mg_data.smoother.degree,
                smoothing_range=mg_data.smoother.smoothing_range,
                eig_cg_n_iterations=mg_data.smoother.eig_cg_n_iterations,
            )
        )
    A0 = mats[0].toarray()
    coarse = DirectCoarseSolver(
        L=jnp.asarray(np.linalg.cholesky(A0), jnp.float64 if dtype == jnp.float64 else dtype)
    )
    return Multigrid(
        operators=operators,
        smoothers=smoothers,
        transfers=transfers,
        coarse_solve=coarse,
        n_cycles=1,
    )


def build_stokes_nsinker(
    mesh: AdaptiveMesh, mg_data, viscosity, dtype=jnp.float64,
    coarsening: str = "mean", schur: str = "mass",
):
    """Q2-Q1 Taylor-Hood Stokes with cellwise viscosity ``viscosity``
    (callable: [n, 3] centers -> [n] eta).  Mirrors stokes.build_stokes;
    returns (op, block_preconditioner, aux).

    ``coarsening`` selects the velocity-GMG coarse-grid construction:
      * "mean" — RE-DISCRETIZED levels with arithmetic 8-to-1 volume
        averaging of the viscosity (beats point sampling 1.6-2x at contrast
        1e3-1e4; loses the hierarchy at >= 1e5);
      * "galerkin" — matrix-DEPENDENT coarse operators A_c = P^T A_f P from
        the assembled fine matrix and the exact Q2 embedding
        (assemble_prolongation); the fine level stays matrix-free.  The
        high-contrast (1e6) regime of the reference's mantle-convection
        pointer (mantle-convection/README.md:1-25, ASPECT nsinker)."""
    from .. import api
    from ..mesh.coarsening import geometric_coarsening_sequence
    from ..solvers.multigrid import PreconditionMG

    assert mesh.dim == 3
    dofh_v = distribute_dofs(mesh, 2)
    dofh_p = distribute_dofs(mesh, 1)
    hang_v = make_hanging_node_constraints(dofh_v)
    assert hang_v.n_slaves == 0, "nsinker slice: uniform (conforming) mesh"

    # velocity GMG hierarchy with volume-AVERAGED viscosity coarsening:
    # arithmetic 8-to-1 averaging of the fine field down the hierarchy
    # beats point re-sampling ~1.6-2x in outer iterations at contrast
    # 1e3-1e4 (measured, RESULTS.md round-3d; harmonic averaging loses the
    # stiff inclusions entirely and diverges at 1e4).  The uniform
    # hypercube's Morton order makes children the 8 consecutive cells of
    # each parent (asserted).
    tri_seq = geometric_coarsening_sequence(mesh)
    plan = api.gc_level_plan("HMG-global", tri_seq, 2)
    eta_fine_cells = np.asarray(viscosity(mesh.centers()), np.float64)
    if coarsening == "galerkin":
        mg = _build_galerkin_velocity_mg(plan, eta_fine_cells, mg_data, dtype)
        v_precond = PreconditionMG(mg, dtype)
        a_op = VectorOperator(mg.operators[-1], 3)
        levels = None
    else:
        eta_ladder = [eta_fine_cells]
        for lvl in range(len(plan) - 1):
            fine_c = plan[len(plan) - 1 - lvl][0].centers()
            coarse_c = plan[len(plan) - 2 - lvl][0].centers()
            assert np.allclose(
                fine_c.reshape(-1, 8, 3).mean(1), coarse_c, atol=1e-12
            ), "Morton 8-block/parent misalignment"
            eta_ladder.append(eta_ladder[-1].reshape(-1, 8).mean(1))
        eta_ladder = eta_ladder[::-1]  # coarsest first, aligned with plan
        levels = []
        for (m, d), eta_cells in zip(plan, eta_ladder):
            dofh = distribute_dofs(m, d)
            hanging = make_hanging_node_constraints(dofh)
            op = make_operator(dofh, hanging, dtype=dtype, cell_weights=eta_cells)
            inv_diag = to_device(
                1.0 / compute_diagonal(dofh, hanging, cell_weights=eta_cells),
                dtype=dtype,
            )
            levels.append(api.LevelContext(m, d, dofh, hanging, op, inv_diag))
        mg, _ = api.build_gc_preconditioner(levels, mg_data, dtype, dtype)
        v_precond = PreconditionMG(mg, dtype)
        a_op = VectorOperator(levels[-1].op, 3)

    B = assemble_divergence(dofh_v, dofh_p)
    keep1 = np.ones(dofh_v.n_dofs)
    keep1[dofh_v.boundary_mask] = 0.0
    keep_v = np.tile(keep1, 3)

    eta_fine = eta_fine_cells
    if schur == "wbfbt":
        # scaled BFBT: robust where the weighted mass degrades (sharp
        # inclusions at contrast >= 1e4; see WBFBTSchurSolve docstring)
        inv_diag_fine = np.asarray(
            mg.smoothers[-1].inv_diag
            if coarsening == "galerkin"
            else levels[-1].inv_diag,
            np.float64,
        )
        p_solve = make_wbfbt_schur(
            B, a_op, 1.0 / inv_diag_fine, keep1, dtype
        )
    else:
        # Schur: 1/eta-weighted consistent pressure mass under the same
        # fixed-interval Chebyshev (bounds are weight-invariant)
        Mp = assemble_pressure_mass(dofh_p, cell_weights=1.0 / eta_fine)
        p_solve = make_mass_solve(Mp, dtype)

    op = StokesOperator(
        a_op=a_op,
        B=_to_ell(B, dtype),
        Bt=_to_ell(B.T.tocsr(), dtype),
        keep_v=to_device(keep_v, dtype),
        n_v=dofh_v.n_dofs,
        n_p=dofh_p.n_dofs,
    )
    precond = StokesBlockPreconditioner(
        v_precond=v_precond,
        p_solve=p_solve,
        n_v=dofh_v.n_dofs,
        n_p=dofh_p.n_dofs,
    )
    aux = {"dofh_v": dofh_v, "dofh_p": dofh_p, "B": B, "levels": levels,
           "eta_fine": eta_fine}
    return op, precond, aux
