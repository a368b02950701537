"""Stokes flow: Q2-Q1 (Taylor-Hood) block operator + block-preconditioned
MINRES — the first slice of the mantle-convection workload.

The reference repository only POINTS at this workload
(mantle-convection/README.md:1-25 — the nsinker benchmark lives in a
separate repo), so a working Stokes solve is parity-plus.  Built from the
framework's own pieces:

  * viscous block A: the vector Laplacian (ops/vector.py::VectorOperator
    over the scalar constrained operator, component-major [3, n_v]) with
    homogeneous Dirichlet velocity;
  * coupling B (pressure test x velocity divergence): assembled exactly on
    the host per cell from 1D mixed-degree integrals (tensor products —
    uniform hexahedra), applied as a padded-ELL matvec/rmatvec;
  * preconditioner: block-diagonal [GMG-V-cycle per velocity component,
    inverse lumped pressure mass] around MINRES on the saddle system —
    the standard Schur-complement-spectrally-equivalent choice giving
    mesh-independent outer iterations (Elman/Silvester/Wathen).

The saddle operator keeps Dirichlet velocity rows as identity (B's
constrained columns are masked), and the hydrostatic pressure mode (the
constant) is handled by projecting the RHS and iterates mean-free.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from ..mesh.dof import DoFHandler, distribute_dofs, make_hanging_node_constraints
from ..mesh.octree import AdaptiveMesh
from ..ops import tensor
from ..solvers.amg import ELLMatrix, _to_ell
from ..utils.device import to_device


def _mixed_1d_tables(p_v: int, p_p: int):
    """(G, M): G[a, b] = int m_a l'_b, M[a, b] = int m_a l_b on [0, 1] for
    pressure basis m (degree p_p) and velocity basis l (degree p_v)."""
    n_q = p_v + p_p + 1
    q, w = tensor.gauss_points(n_q)
    mp = tensor.lagrange_values(tensor.gauss_lobatto_points(p_p + 1), q)
    lv = tensor.lagrange_values(tensor.gauss_lobatto_points(p_v + 1), q)
    dv = tensor.lagrange_derivatives(tensor.gauss_lobatto_points(p_v + 1), q)
    G = np.einsum("q,qa,qb->ab", w, mp, dv)
    M = np.einsum("q,qa,qb->ab", w, mp, lv)
    return G, M


def assemble_divergence(
    dofh_v: DoFHandler, dofh_p: DoFHandler
) -> sp.csr_matrix:
    """B [n_p, 3 * n_v] with component-major velocity columns:
    B[q, c * n_v + i] = int_Omega m_q  d_c(l_i).  Exact on the uniform
    hexahedral mesh (per-cell tensor products of 1D integrals, physical
    scaling h^2 per cell)."""
    mesh = dofh_v.mesh
    p_v, p_p = dofh_v.degree, dofh_p.degree
    G, M = _mixed_1d_tables(p_v, p_p)
    n1v, n1p = p_v + 1, p_p + 1
    h = mesh.h(mesh.level)

    # local tensor blocks per component: Bc[(qz,qy,qx),(iz,iy,ix)]
    def kron3(Az, Ay, Ax):
        return np.einsum("ad,be,cf->abcdef", Az, Ay, Ax).reshape(
            n1p**3, n1v**3
        )

    Bloc = [kron3(M, M, G), kron3(M, G, M), kron3(G, M, M)]  # d_x, d_y, d_z

    n_v, n_p = dofh_v.n_dofs, dofh_p.n_dofs
    rows, cols, vals = [], [], []
    scale = h * h  # h^3 volume x h^-1 derivative
    for c in range(3):
        # all cells share the local block; scatter with per-cell scale
        r = np.repeat(dofh_p.cell_dofs, n1v**3, axis=1).reshape(-1)
        co = np.tile(dofh_v.cell_dofs, (1, n1p**3)).reshape(-1)
        v = (scale[:, None, None] * Bloc[c][None, :, :]).reshape(-1)
        rows.append(r)
        cols.append(co + c * n_v)
        vals.append(v)
    B = sp.csr_matrix(
        (
            np.concatenate(vals),
            (np.concatenate(rows), np.concatenate(cols)),
        ),
        shape=(n_p, 3 * n_v),
    )
    B.sum_duplicates()
    return B


@dataclass(frozen=True)
class StokesOperator:
    """Symmetric saddle operator on flat vectors [3 * n_v + n_p]:
    [[A, keep .* B^T], [B .* keep, 0]] with identity on Dirichlet velocity
    rows (the constrained-row convention of the scalar operators)."""

    a_op: object             # VectorOperator (vmult on [3, n_v])
    B: ELLMatrix             # [n_p, 3 n_v]
    Bt: ELLMatrix            # [3 n_v, n_p]
    keep_v: jax.Array        # f [3 * n_v]: 0 on Dirichlet velocity dofs
    n_v: int
    n_p: int

    @property
    def dtype(self):
        return self.a_op.dtype

    def vmult(self, x: jax.Array) -> jax.Array:
        u = x[: 3 * self.n_v]
        p = x[3 * self.n_v :]
        au = self.a_op.vmult(u.reshape(3, self.n_v)).reshape(-1)
        btp = self.Bt.matvec(p) * self.keep_v
        bu = self.B.matvec(u * self.keep_v)
        return jnp.concatenate([au + btp, bu])

    def dot(self, x, y):
        return jnp.sum(x * y)


jax.tree_util.register_dataclass(
    StokesOperator,
    data_fields=["a_op", "B", "Bt", "keep_v"],
    meta_fields=["n_v", "n_p"],
)


@dataclass(frozen=True)
class LumpedMassSolve:
    """S_hat^{-1} as the inverse lumped (row-sum) pressure mass."""

    inv_lump: jax.Array

    def vmult(self, r: jax.Array) -> jax.Array:
        return self.inv_lump * r


jax.tree_util.register_dataclass(
    LumpedMassSolve, data_fields=["inv_lump"], meta_fields=[]
)


@dataclass(frozen=True)
class MassOperator:
    """Consistent pressure mass as an operator pytree (ELL matvec)."""

    M: ELLMatrix

    def vmult(self, x: jax.Array) -> jax.Array:
        return self.M.matvec(x)

    @property
    def dtype(self):
        return self.M.data.dtype


jax.tree_util.register_dataclass(MassOperator, data_fields=["M"], meta_fields=[])


@dataclass(frozen=True)
class StokesBlockPreconditioner:
    """diag(GMG(A) per component, S_hat^-1): SPD, spectrally equivalent to
    diag(A, S)^-1 for Taylor-Hood (the pressure mass is spectrally
    equivalent to the Schur complement).  ``p_solve`` applies S_hat^{-1};
    the production choice is Chebyshev on the CONSISTENT mass — lumping
    alone inflates the apparent Schur interval ~2.5x (measured r=2
    hypercube: MINRES 96 -> 59, see build_stokes)."""

    v_precond: object        # scalar preconditioner with vmult (PreconditionMG)
    p_solve: object          # S_hat^{-1} with vmult (mass solve)
    n_v: int
    n_p: int

    def vmult(self, r: jax.Array) -> jax.Array:
        ru = r[: 3 * self.n_v].reshape(3, self.n_v)
        rp = r[3 * self.n_v :]
        zu = jax.vmap(self.v_precond.vmult)(ru).reshape(-1)
        return jnp.concatenate([zu, self.p_solve.vmult(rp)])

    __call__ = vmult


jax.tree_util.register_dataclass(
    StokesBlockPreconditioner,
    data_fields=["v_precond", "p_solve"],
    meta_fields=["n_v", "n_p"],
)


@dataclass(frozen=True)
class StokesTriangularPreconditioner:
    """Block upper-triangular P = [[A_hat, B^T], [0, -S_hat]]: the
    nonsymmetric upgrade of the block-diagonal preconditioner
    (Elman/Silvester/Wathen ch. 9).  With the same blocks (GMG V-cycle for
    A_hat, lumped pressure mass for S_hat) the preconditioned spectrum
    clusters near {1}, cutting the outer count ~3x vs block-diagonal
    MINRES at the cost of symmetry — pair with solvers/gmres.py."""

    v_precond: object        # scalar preconditioner with vmult (PreconditionMG)
    p_solve: object          # S_hat^{-1} with vmult (mass solve)
    Bt: ELLMatrix            # [3 n_v, n_p]
    keep_v: jax.Array        # f [3 * n_v]
    n_v: int
    n_p: int

    def vmult(self, r: jax.Array) -> jax.Array:
        ru = r[: 3 * self.n_v]
        rp = r[3 * self.n_v :]
        zp = -self.p_solve.vmult(rp)
        w = (ru - self.Bt.matvec(zp) * self.keep_v).reshape(3, self.n_v)
        zu = jax.vmap(self.v_precond.vmult)(w).reshape(-1)
        return jnp.concatenate([zu, zp])

    __call__ = vmult


jax.tree_util.register_dataclass(
    StokesTriangularPreconditioner,
    data_fields=["v_precond", "p_solve", "Bt", "keep_v"],
    meta_fields=["n_v", "n_p"],
)


def minres_solve(
    a_vmult,
    b: jax.Array,
    preconditioner=None,
    maxiter: int = 200,
    reltol: float = 1e-8,
):
    """Preconditioned MINRES for symmetric (indefinite) systems; the
    preconditioner must be SPD.  Jittable (lax.while_loop); returns
    (x, n_iterations, residual_norm_preconditioned)."""
    if preconditioner is None:
        preconditioner = lambda r: r

    v_old = jnp.zeros_like(b)
    v = b
    z = preconditioner(v)
    gamma = jnp.sqrt(jnp.sum(v * z))
    gamma0 = gamma
    eta = gamma
    s_old = jnp.asarray(0.0, b.dtype)
    s = jnp.asarray(0.0, b.dtype)
    c_old = jnp.asarray(1.0, b.dtype)
    c = jnp.asarray(1.0, b.dtype)
    w = jnp.zeros_like(b)
    w_old = jnp.zeros_like(b)
    x = jnp.zeros_like(b)
    gamma_old = gamma

    def cond(st):
        (x, v, v_old, z, w, w_old, gamma, gamma_old, eta, s_old, s, c_old,
         c, it) = st
        return (jnp.abs(eta) > reltol * gamma0) & (it < maxiter)

    def body(st):
        (x, v, v_old, z, w, w_old, gamma, gamma_old, eta, s_old, s, c_old,
         c, it) = st
        z_n = z / gamma
        Az = a_vmult(z_n)
        delta = jnp.sum(Az * z_n)
        v_new = Az - (delta / gamma) * v - (gamma / gamma_old) * v_old
        z_new = preconditioner(v_new)
        gamma_new = jnp.sqrt(jnp.maximum(jnp.sum(v_new * z_new), 1e-300))
        a0 = c * delta - c_old * s * gamma
        a1 = jnp.sqrt(a0 * a0 + gamma_new * gamma_new)
        a2 = s * delta + c_old * c * gamma
        a3 = s_old * gamma
        c_new = a0 / a1
        s_new = gamma_new / a1
        w_new = (z_n - a3 * w_old - a2 * w) / a1
        x = x + c_new * eta * w_new
        eta = -s_new * eta
        return (
            x, v_new, v, z_new, w_new, w, gamma_new, gamma, eta, s, s_new,
            c, c_new, it + 1,
        )

    st = (
        x, v, v_old, z, w, w_old, gamma, gamma_old, eta, s_old, s, c_old, c,
        jnp.asarray(0, jnp.int32),
    )
    st = jax.lax.while_loop(cond, body, st)
    return st[0], st[-1], jnp.abs(st[8])


def assemble_pressure_mass(
    dofh_p: DoFHandler, cell_weights: np.ndarray | None = None
) -> sp.csr_matrix:
    """Consistent Q_k pressure mass matrix (per-cell tensor products of 1D
    integrals, exact on the uniform hexahedral mesh).  ``cell_weights``
    multiplies per cell — the 1/viscosity weighting that keeps the mass
    spectrally equivalent to the Schur complement under variable viscosity
    (models/nsinker.py)."""
    mesh = dofh_p.mesh
    p_p = dofh_p.degree
    n1 = p_p + 1
    q, w = tensor.gauss_points(p_p + 1)
    lv = tensor.lagrange_values(tensor.gauss_lobatto_points(n1), q)
    M1 = np.einsum("q,qa,qb->ab", w, lv, lv)
    Mloc = np.einsum("ad,be,cf->abcdef", M1, M1, M1).reshape(n1**3, n1**3)
    h3 = np.broadcast_to(
        np.asarray(mesh.h(mesh.level)) ** 3, (dofh_p.cell_dofs.shape[0],)
    )
    if cell_weights is not None:
        h3 = h3 * np.asarray(cell_weights, np.float64)
    rows = np.repeat(dofh_p.cell_dofs, n1**3, axis=1).reshape(-1)
    cols = np.tile(dofh_p.cell_dofs, (1, n1**3)).reshape(-1)
    vals = np.einsum("c,ab->cab", h3, Mloc).reshape(-1)
    M = sp.csr_matrix(
        (vals, (rows, cols)), shape=(dofh_p.n_dofs, dofh_p.n_dofs)
    )
    M.sum_duplicates()
    return M


def make_mass_solve(
    Mp: sp.csr_matrix, dtype, degree: int = 8
) -> "object":
    """Chebyshev approximation of M_p^{-1} (diagonal-preconditioned): for
    Q1 mass on uniform hexes, eig(D^{-1} M) subset [1/27, 3.375] by tensor
    structure, so a fixed degree gives a few-percent-accurate solve with
    ``degree`` cheap ELL matvecs — no eigenvalue estimation program."""
    from ..solvers.chebyshev import ChebyshevSmoother

    diag = np.asarray(Mp.diagonal())
    op = MassOperator(_to_ell(Mp, dtype))
    # exact tensor-product bounds for D^{-1} M: 1D eigs of
    # diag(4/6)^{-1} (1/6) tridiag(1,4,1) lie in [(4-2)/4, (4+2)/4] =
    # [1/2, 3/2]; 3D = cubes of 1D values -> [1/8, 27/8].
    lam_max = 27.0 / 8.0
    lam_min = 1.0 / 8.0
    smoother = ChebyshevSmoother(
        op=op,
        inv_diag=to_device(1.0 / diag, dtype),
        degree=degree,
        theta=float(0.5 * (lam_max + lam_min)),
        delta=float(0.5 * (lam_max - lam_min)),
    )
    return smoother


def build_stokes(mesh: AdaptiveMesh, mg_data, dtype=jnp.float64,
                 mass_solver: str = "chebyshev"):
    """Assemble the Taylor-Hood Stokes system + preconditioner on a uniform
    hypercube mesh.  Returns (op, precond, aux dict)."""
    from .. import api
    from ..mesh.coarsening import geometric_coarsening_sequence
    from ..ops.vector import VectorOperator
    from ..solvers.multigrid import PreconditionMG

    assert mesh.dim == 3
    dofh_v = distribute_dofs(mesh, 2)
    dofh_p = distribute_dofs(mesh, 1)
    hang_v = make_hanging_node_constraints(dofh_v)
    assert hang_v.n_slaves == 0, "Stokes slice: uniform (conforming) mesh"

    # velocity GMG hierarchy (gather engine; hypercube => pure h-levels)
    tri_seq = geometric_coarsening_sequence(mesh)
    plan = api.gc_level_plan("HMG-global", tri_seq, 2)
    levels = [api.build_level(m, d, dtype) for m, d in plan]
    mg, _ = api.build_gc_preconditioner(levels, mg_data, dtype, dtype)
    v_precond = PreconditionMG(mg, dtype)
    a_scalar = levels[-1].op
    a_op = VectorOperator(a_scalar, 3)

    B = assemble_divergence(dofh_v, dofh_p)
    keep1 = np.ones(dofh_v.n_dofs)
    keep1[dofh_v.boundary_mask] = 0.0
    keep_v = np.tile(keep1, 3)

    # Schur approximation S_hat = pressure mass.  "chebyshev" (production)
    # applies ~M_p^{-1} with a fixed-interval Chebyshev on the CONSISTENT
    # mass: lumping alone stretches the preconditioned Schur interval
    # ~2.5x (measured r=2: block-diag MINRES 96 -> 59 outer iterations,
    # triangular GMRES 75 -> ~32).  "lumped" keeps the one-multiply row-sum
    # inverse.
    h3 = mesh.h(mesh.level) ** 3
    lump = np.zeros(dofh_p.n_dofs)
    np.add.at(
        lump, dofh_p.cell_dofs.reshape(-1),
        np.repeat(h3 / 8.0, dofh_p.n_loc),
    )
    if mass_solver == "chebyshev":
        p_solve = make_mass_solve(assemble_pressure_mass(dofh_p), dtype)
    elif mass_solver == "lumped":
        p_solve = LumpedMassSolve(to_device(1.0 / lump, dtype))
    else:
        raise ValueError(mass_solver)

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
    aux = {"dofh_v": dofh_v, "dofh_p": dofh_p, "B": B, "levels": levels}
    return op, precond, aux


def triangular_preconditioner(
    op: StokesOperator, block: StokesBlockPreconditioner
) -> StokesTriangularPreconditioner:
    """Assemble the block-triangular preconditioner from the same blocks as
    the block-diagonal one (no extra setup cost)."""
    return StokesTriangularPreconditioner(
        v_precond=block.v_precond,
        p_solve=block.p_solve,
        Bt=op.Bt,
        keep_v=op.keep_v,
        n_v=op.n_v,
        n_p=op.n_p,
    )


def project_pressure_mean(x: jax.Array, n_v: int, n_p: int) -> jax.Array:
    """Remove the hydrostatic (constant) pressure mode."""
    p = x[3 * n_v :]
    return x.at[3 * n_v :].set(p - jnp.mean(p))
