"""Manufactured-solution convergence for the Q2-Q1 Stokes discretization.

Divergence-free velocity on [-1, 1]^3 with homogeneous Dirichlet BCs:

    g(t) = sin^2(b (t+1)),  b = pi/2       (g = 0 and g' = 0-compatible
    u = ( g(x) g'(y),  -g'(x) g(y),  0 ) * g(z)      at every boundary)
    p = sin(b (x+1)) cos(b (y+1))  (mean-projected)

div u = 0 exactly; f is assembled analytically from -lap(u) and grad(p).
The discrete RHS uses the consistent Q2 mass on the interpolated f
(quadrature/interpolation error O(h^3), below the Q2 L2 rate), so L2
velocity errors must contract ~8x per refinement (h^3) and pressure ~4x
(Q1, h^2).  This pins the saddle DISCRETIZATION (divergence coupling,
signs, constraint handling), complementing the solver-level tests.
"""

import numpy as np
import jax.numpy as jnp

from dealii_multigrid_tpu.mesh import generators as G
from dealii_multigrid_tpu.models import stokes as ST
from dealii_multigrid_tpu.solvers.gmres import gmres_solve
from dealii_multigrid_tpu.utils.params import MultigridParameters

B_ = np.pi / 2.0


def _g(t):
    return np.sin(B_ * (t + 1.0)) ** 2


def _g1(t):
    return B_ * np.sin(2.0 * B_ * (t + 1.0))


def _g2(t):
    return 2.0 * B_**2 * np.cos(2.0 * B_ * (t + 1.0))


def _g3(t):
    return -4.0 * B_**3 * np.sin(2.0 * B_ * (t + 1.0))


def _exact(pts):
    x, y, z = pts[:, 0], pts[:, 1], pts[:, 2]
    ux = _g(x) * _g1(y) * _g(z)
    uy = -_g1(x) * _g(y) * _g(z)
    uz = np.zeros_like(x)
    p = np.sin(B_ * (x + 1.0)) * np.cos(B_ * (y + 1.0))
    return np.stack([ux, uy, uz]), p


def _forcing(pts):
    """f = -lap(u) - grad(p) (the operator's sign convention:
    [A u + B^T p] with (B u)_q = int q div u)."""
    x, y, z = pts[:, 0], pts[:, 1], pts[:, 2]
    lap_ux = (
        _g2(x) * _g1(y) * _g(z)
        + _g(x) * _g3(y) * _g(z)
        + _g(x) * _g1(y) * _g2(z)
    )
    lap_uy = -(
        _g3(x) * _g(y) * _g(z)
        + _g1(x) * _g2(y) * _g(z)
        + _g1(x) * _g(y) * _g2(z)
    )
    px = B_ * np.cos(B_ * (x + 1.0)) * np.cos(B_ * (y + 1.0))
    py = -B_ * np.sin(B_ * (x + 1.0)) * np.sin(B_ * (y + 1.0))
    fx = -lap_ux - px
    fy = -lap_uy - py
    fz = np.zeros_like(x)
    return np.stack([fx, fy, fz])


def _solve(r):
    mesh = G.create("hypercube", 3, r, 0)
    mg_data = MultigridParameters()
    mg_data.smoother.degree = 3
    mg_data.coarse_solver.type = "amg"
    op, block, aux = ST.build_stokes(mesh, mg_data, dtype=jnp.float64)
    tri = ST.triangular_preconditioner(op, block)
    dofh_v, dofh_p = aux["dofh_v"], aux["dofh_p"]
    n_v, n_p = op.n_v, op.n_p

    # consistent Q2 mass (assemble_pressure_mass is degree-generic)
    Mv = ST.assemble_pressure_mass(dofh_v)
    f = _forcing(dofh_v.points)
    bu = np.concatenate([Mv @ f[c] for c in range(3)]) * np.asarray(op.keep_v)
    b = np.concatenate([bu, np.zeros(n_p)])

    res = gmres_solve(
        op.vmult, jnp.asarray(b), preconditioner=tri.vmult, m=80,
        reltol=1e-10, maxiter=400,
    )
    assert bool(res.converged)
    xs = ST.project_pressure_mean(res.x, n_v, n_p)
    uh = np.asarray(xs[: 3 * n_v]).reshape(3, n_v)
    ph = np.asarray(xs[3 * n_v :])

    u_ex, p_ex = _exact(dofh_v.points)
    p_ex_nodes = _exact(dofh_p.points)[1]
    p_ex_nodes = p_ex_nodes - p_ex_nodes.mean()

    du = uh - u_ex
    err_u = np.sqrt(sum(du[c] @ (Mv @ du[c]) for c in range(3)))
    Mp = ST.assemble_pressure_mass(dofh_p)
    dp = ph - p_ex_nodes
    dp = dp - dp.mean()
    err_p = np.sqrt(dp @ (Mp @ dp))
    return err_u, err_p


def test_stokes_manufactured_convergence():
    eu2, ep2 = _solve(2)
    eu3, ep3 = _solve(3)
    # Q2 velocity: L2 rate h^3 (8x); allow 5x for preasymptotics
    assert eu3 < eu2 / 5.0, (eu2, eu3)
    # Q1 pressure: L2 rate h^2 (4x); allow 2.5x
    assert ep3 < ep2 / 2.5, (ep2, ep3)
    # absolute sanity: errors are small, not O(1) (sign conventions right)
    assert eu2 < 0.2 and ep2 < 1.0, (eu2, ep2)
