"""Variable-viscosity Stokes (nsinker) tests."""

import numpy as np
import jax.numpy as jnp

from dealii_multigrid_tpu.mesh import generators as G
from dealii_multigrid_tpu.models import nsinker as NS
from dealii_multigrid_tpu.models import stokes as ST
from dealii_multigrid_tpu.solvers.gmres import gmres_solve
from dealii_multigrid_tpu.utils.params import MultigridParameters


def _mg_data():
    mg = MultigridParameters()
    mg.smoother.degree = 3
    mg.coarse_solver.type = "amg"
    return mg


def test_unit_viscosity_matches_constant_operator():
    """eta == 1 must reproduce the constant-viscosity saddle operator
    exactly (the cell_weights path is a pure per-cell scaling)."""
    mesh = G.create("hypercube", 3, 2, 0)
    op_c, _, _ = ST.build_stokes(mesh, _mg_data(), dtype=jnp.float64)
    op_v, _, _ = NS.build_stokes_nsinker(
        mesh, _mg_data(), lambda x: np.ones(x.shape[0]), dtype=jnp.float64
    )
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=3 * op_c.n_v + op_c.n_p))
    ya = np.asarray(op_c.vmult(x))
    yb = np.asarray(op_v.vmult(x))
    assert np.max(np.abs(ya - yb)) < 1e-11 * np.max(np.abs(ya))


def test_nsinker_bounded_iterations_and_residual():
    """4 sinkers at viscosity contrast 1e2: the rediscretized-GMG +
    1/eta-weighted-mass triangular GMRES converges with a bounded outer
    count and a small TRUE residual."""
    mesh = G.create("hypercube", 3, 2, 0)
    visc = NS.nsinker_viscosity(n_sinkers=4, eta_max=1e2, seed=1)
    op, block, aux = NS.build_stokes_nsinker(mesh, _mg_data(), visc)
    assert aux["eta_fine"].max() > 50 and aux["eta_fine"].min() < 2.0
    tri = ST.triangular_preconditioner(op, block)
    n_v, n_p = op.n_v, op.n_p

    rng = np.random.default_rng(2)
    b = rng.normal(size=3 * n_v + n_p)
    b[: 3 * n_v] *= np.asarray(op.keep_v)
    b[3 * n_v :] -= b[3 * n_v :].mean()
    bj = jnp.asarray(b)

    res = gmres_solve(op.vmult, bj, preconditioner=tri.vmult, m=80,
                      reltol=1e-8, maxiter=300)
    assert bool(res.converged), int(res.n_iterations)
    assert int(res.n_iterations) < 200, int(res.n_iterations)

    x = ST.project_pressure_mean(res.x, n_v, n_p)
    r_true = np.asarray(op.vmult(x)) - b
    r_true[3 * n_v :] -= r_true[3 * n_v :].mean()
    assert np.linalg.norm(r_true) / np.linalg.norm(b) < 1e-6
