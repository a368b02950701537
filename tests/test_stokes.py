"""Stokes (Taylor-Hood Q2-Q1) block operator + MINRES tests."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from dealii_multigrid_tpu.mesh import generators as G
from dealii_multigrid_tpu.mesh.dof import distribute_dofs
from dealii_multigrid_tpu.models import stokes as ST
from dealii_multigrid_tpu.utils.params import MultigridParameters


def test_minres_matches_dense_solve():
    rng = np.random.default_rng(0)
    n = 40
    Q = rng.normal(size=(n, n))
    A = Q + Q.T + 0.1 * np.eye(n)  # symmetric indefinite
    b = rng.normal(size=n)
    Aj = jnp.asarray(A)
    x, it, res = ST.minres_solve(
        lambda v: Aj @ v, jnp.asarray(b), maxiter=400, reltol=1e-12
    )
    assert np.linalg.norm(A @ np.asarray(x) - b) < 1e-8 * np.linalg.norm(b)


def test_divergence_matrix_exact_on_linear_field():
    """B applied to u = (x, 0, 0) must equal the pressure-mass row sums
    (int m_q * div u with div u == 1): an exact-integration check."""
    mesh = G.create("hypercube", 3, 2, 0)
    dofh_v = distribute_dofs(mesh, 2)
    dofh_p = distribute_dofs(mesh, 1)
    B = ST.assemble_divergence(dofh_v, dofh_p)
    u = np.zeros(3 * dofh_v.n_dofs)
    u[: dofh_v.n_dofs] = dofh_v.points[:, 0]  # u_x = x
    got = B @ u
    h3 = mesh.h(mesh.level) ** 3
    lump = np.zeros(dofh_p.n_dofs)
    np.add.at(
        lump, dofh_p.cell_dofs.reshape(-1), np.repeat(h3 / 8.0, dofh_p.n_loc)
    )
    assert np.abs(got - lump).max() < 1e-12


@pytest.mark.parametrize("r", [2, 3])
def test_stokes_solve_bounded_iterations(r):
    """Block-diagonal (GMG velocity, lumped pressure mass) MINRES converges
    in a bounded number of outer iterations.

    The preconditioned Schur spectrum is [~0.012, ~1] in the fine-mesh limit
    (measured eig(M_p^-1 S): max 0.50 at r=2 -> 0.82 at r=3, converging to
    its bounded continuum value; min ~0.012 = the discrete inf-sup constant
    squared), so counts grow preasymptotically and plateau near ~140 at
    rtol 1e-8 — bounded, as the block-diagonal theory predicts."""
    mesh = G.create("hypercube", 3, r, 0)
    mg_data = MultigridParameters()
    mg_data.smoother.degree = 3
    mg_data.coarse_solver.type = "amg"
    op, precond, aux = ST.build_stokes(mesh, mg_data, dtype=jnp.float64)
    n_v, n_p = op.n_v, op.n_p

    rng = np.random.default_rng(1)
    b = rng.normal(size=3 * n_v + n_p)
    b[: 3 * n_v] *= np.asarray(op.keep_v)       # force-consistent with BC
    b[3 * n_v :] -= b[3 * n_v :].mean()          # mean-free pressure RHS
    bj = jnp.asarray(b)

    @jax.jit
    def solve(op, precond, bj):
        return ST.minres_solve(
            op.vmult, bj, preconditioner=precond.vmult,
            maxiter=200, reltol=1e-8,
        )

    x, it, res = solve(op, precond, bj)
    x = ST.project_pressure_mean(x, n_v, n_p)
    # true residual, mean-free part
    r_true = np.asarray(op.vmult(x)) - b
    r_true[3 * n_v :] -= r_true[3 * n_v :].mean()
    rel = np.linalg.norm(r_true) / np.linalg.norm(b)
    assert rel < 1e-6, (rel, int(it))
    assert int(it) < 160, int(it)
