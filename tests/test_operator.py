"""Operator tests: vmult vs assembled matrix, diagonal, symmetry, rhs/convergence."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from dealii_multigrid_tpu.mesh import generators as G
from dealii_multigrid_tpu.mesh import dof as D
from dealii_multigrid_tpu.ops import element as E
from dealii_multigrid_tpu.ops import operator as OP
from dealii_multigrid_tpu.solvers.coarse import assemble_sparse_matrix
from dealii_multigrid_tpu.solvers.cg import cg_solve
from dealii_multigrid_tpu.models import poisson as P


@pytest.mark.parametrize("dim,p", [(1, 1), (2, 2), (3, 1), (3, 3)])
def test_element_matrix_vs_quadrature(dim, p):
    from dealii_multigrid_tpu.mesh.dof import local_node_indices
    from dealii_multigrid_tpu.ops import tensor as T

    A = E.laplace_element_matrix(dim, p)
    n = p + 1
    B, Dm, q, w = T.shape_tables(p, n)
    loc = local_node_indices(dim, p)
    nq = len(q)
    flat = np.arange(nq**dim)
    qidx = np.stack([(flat // nq**d) % nq for d in range(dim)], 1)
    wts = np.prod(w[qidx], axis=1)
    Adir = np.zeros((n**dim, n**dim))
    for d in range(dim):
        Gq = np.ones((nq**dim, n**dim))
        for e in range(dim):
            mat = Dm if e == d else B
            Gq *= mat[qidx[:, e][:, None], loc[:, e][None, :]]
        Adir += np.einsum("q,qi,qj->ij", wts, Gq, Gq)
    assert np.abs(A - Adir).max() < 1e-12
    ev = np.linalg.eigvalsh(A)
    assert abs(ev[0]) < 1e-10 and ev[1] > 0  # SPSD, nullspace = constants


@pytest.mark.parametrize(
    "dim,p,r", [(2, 1, 3), (2, 2, 3), (3, 1, 3), (3, 2, 3), (3, 3, 2)]
)
def test_vmult_and_diagonal_vs_assembled(dim, p, r):
    m = G.create_quadrant(dim, r)
    h = D.distribute_dofs(m, p)
    c = D.make_hanging_node_constraints(h)
    op = OP.make_operator(h, c, dtype=jnp.float64)
    A = assemble_sparse_matrix(h, c)
    u = np.random.default_rng(3).normal(size=h.n_dofs)
    r1 = np.asarray(jax.jit(op.vmult)(jnp.asarray(u)))
    r2 = A @ u
    assert np.abs(r1 - r2).max() / np.abs(r2).max() < 1e-12
    dd = OP.compute_diagonal(h, c)
    assert np.abs(dd - A.diagonal()).max() / np.abs(A.diagonal()).max() < 1e-12


def test_vmult_symmetric():
    m = G.create_quadrant(3, 3)
    h = D.distribute_dofs(m, 2)
    c = D.make_hanging_node_constraints(h)
    op = OP.make_operator(h, c, dtype=jnp.float64)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=h.n_dofs))
    y = jnp.asarray(rng.normal(size=h.n_dofs))
    vm = jax.jit(op.vmult)
    assert abs(float(x @ vm(y)) - float(y @ vm(x))) < 1e-9


@pytest.mark.parametrize("p", [1, 2, 3])
def test_manufactured_convergence_uniform(p):
    """L2 convergence at order p+1 on uniformly refined hypercube (SURVEY §4)."""

    def exact(x):
        return (
            jnp.sin(jnp.pi * x[..., 0])
            * jnp.sin(jnp.pi * x[..., 1])
            * jnp.cos(0.5 * jnp.pi * x[..., 2])
            + 0.3 * x[..., 0]
        )

    def rhs(x):
        return (
            jnp.pi**2
            * 2.25
            * jnp.sin(jnp.pi * x[..., 0])
            * jnp.sin(jnp.pi * x[..., 1])
            * jnp.cos(0.5 * jnp.pi * x[..., 2])
        )

    errs = []
    for r in (2, 3):
        m = G.create_hypercube(3, r)
        h = D.distribute_dofs(m, p)
        c = D.make_hanging_node_constraints(h)
        op = OP.make_operator(h, c, dtype=jnp.float64)
        prob = P.assemble_problem(h, c, op, rhs, exact, exact)
        dinv = jnp.asarray(1.0 / OP.compute_diagonal(h, c))
        res = cg_solve(
            op.vmult, prob.rhs, preconditioner=lambda x: dinv * x,
            reltol=1e-12, maxiter=20000,
        )
        u = prob.full_solution(res.x)
        errs.append(float(P.l2_error(prob, u)))
    rate = np.log2(errs[0] / errs[1])
    assert rate > p + 0.6, (p, errs, rate)


def test_gaussian_matches_reference_values():
    """Pin the Gaussian solution/RHS formulas (multigrid_throughput.cc:60-127)."""
    x = jnp.array([[-0.5, -0.5, -0.5], [0.0, 0.0, 0.0]])
    v = P.gaussian_solution(x)
    w = 0.1
    peak = 1.0 / (np.sqrt(2 * np.pi) * w) ** 3
    assert abs(float(v[0]) - peak) < 1e-8
    assert abs(float(v[1]) - peak * np.exp(-0.75 / w**2)) < 1e-12
    f = P.gaussian_rhs(x)
    assert abs(float(f[0]) - 6.0 / w**2 * peak) < 1e-4


def test_vector_operator_componentwise():
    """n_components > 1 vector Laplacian (ops/vector.py — the reference
    stubs this case, include/operator.h:396-406): block-diagonal action,
    MG-preconditioned CG per-component identical to the scalar solve."""
    import numpy as np
    from dealii_multigrid_tpu import api
    from dealii_multigrid_tpu.mesh import generators as G
    from dealii_multigrid_tpu.ops.vector import (
        VectorPreconditioner,
        make_vector_operator,
    )
    from dealii_multigrid_tpu.solvers.cg import cg_solve
    from dealii_multigrid_tpu.solvers.multigrid import PreconditionMG
    from dealii_multigrid_tpu.mesh.coarsening import geometric_coarsening_sequence
    from dealii_multigrid_tpu.utils.params import MultigridParameters

    mesh = G.create_quadrant(3, 3)
    plan = api.gc_level_plan(
        "HMG-global", geometric_coarsening_sequence(mesh), 2
    )
    levels = [api.build_level_hybrid(m, d, jnp.float64) for m, d in plan]
    fine = levels[-1]
    mg_data = MultigridParameters()
    mg_data.smoother.degree = 3
    mg = api.build_gc_preconditioner_hybrid(levels, mg_data, jnp.float64)
    precond = PreconditionMG(mg, jnp.float64)

    nc = 3
    vop = make_vector_operator(fine.op, nc)
    vprec = VectorPreconditioner(precond)
    rng = np.random.default_rng(5)
    b1 = jnp.asarray(fine.fmt.from_global(rng.standard_normal(fine.dofh.n_dofs)))
    b = jnp.stack([b1 * (c + 1.0) for c in range(nc)])

    resv = cg_solve(
        vop.vmult, b, preconditioner=vprec.vmult,
        maxiter=50, reltol=1e-10, dot=vop.dot,
    )
    ress = cg_solve(
        fine.op.vmult, b1, preconditioner=precond.vmult,
        maxiter=50, reltol=1e-10, dot=fine.op.dot,
    )
    assert bool(resv.converged)
    # block-diagonal system: component c solution = (c+1) * scalar solution
    for c in range(nc):
        assert np.allclose(
            np.asarray(resv.x[c]), (c + 1.0) * np.asarray(ress.x),
            rtol=1e-8, atol=1e-10,
        )
