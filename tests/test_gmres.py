"""GMRES(m) solver + block-triangular Stokes preconditioner tests."""

import numpy as np
import jax
import jax.numpy as jnp

from dealii_multigrid_tpu.solvers.gmres import (
    gmres_solve,
    gmres_solve_host,
    verify_true_residual,
)


def test_gmres_matches_dense_solve_nonsymmetric():
    rng = np.random.default_rng(3)
    n = 60
    A = np.eye(n) * 4.0 + rng.normal(size=(n, n)) * 0.5  # well-conditioned
    b = rng.normal(size=n)
    Aj = jnp.asarray(A)
    res = gmres_solve(lambda v: Aj @ v, jnp.asarray(b), m=20, reltol=1e-12)
    assert bool(res.converged)
    x = np.asarray(res.x)
    assert np.linalg.norm(A @ x - b) < 1e-9 * np.linalg.norm(b)


def test_gmres_restart_cycles():
    """Force several restart cycles (m smaller than the iteration need)."""
    rng = np.random.default_rng(5)
    n = 120
    # moderately nonnormal system needing > m steps
    A = np.eye(n) * 2.0 + np.triu(rng.normal(size=(n, n)), 1) * 0.3
    b = rng.normal(size=n)
    Aj = jnp.asarray(A)
    res = gmres_solve(lambda v: Aj @ v, jnp.asarray(b), m=8, reltol=1e-10,
                      maxiter=400)
    assert bool(res.converged)
    x = np.asarray(res.x)
    assert np.linalg.norm(A @ x - b) < 1e-7 * np.linalg.norm(b)
    assert int(res.n_iterations) > 8  # actually restarted


def test_gmres_right_preconditioned():
    rng = np.random.default_rng(7)
    n = 80
    d = np.geomspace(1, 1e4, n)
    A = np.diag(d) + rng.normal(size=(n, n)) * 1e-2
    b = rng.normal(size=n)
    Aj = jnp.asarray(A)
    dj = jnp.asarray(d)
    res_plain = gmres_solve(lambda v: Aj @ v, jnp.asarray(b), m=25,
                            reltol=1e-10, maxiter=500)
    res_prec = gmres_solve(lambda v: Aj @ v, jnp.asarray(b), m=25,
                           preconditioner=lambda v: v / dj,
                           reltol=1e-10, maxiter=500)
    assert bool(res_prec.converged)
    # right preconditioning reports the TRUE residual
    x = np.asarray(res_prec.x)
    assert np.linalg.norm(A @ x - b) < 1e-7 * np.linalg.norm(b)
    assert int(res_prec.n_iterations) < int(res_plain.n_iterations)


def test_gmres_jittable():
    rng = np.random.default_rng(9)
    n = 50
    A = jnp.asarray(np.eye(n) * 3.0 + rng.normal(size=(n, n)) * 0.3)
    b = jnp.asarray(rng.normal(size=n))

    @jax.jit
    def run(A, b):
        return gmres_solve(lambda v: A @ v, b, m=15, reltol=1e-10)

    res = run(A, b)
    assert bool(res.converged)


def test_gmres_host_matches_monolithic():
    """The host-restart-loop variant (one jitted application per dispatch —
    the axon-miscompile-safe path) must reproduce the monolithic solver:
    same solution to solver tolerance, comparable iteration count."""
    import dataclasses

    rng = np.random.default_rng(11)
    n = 120
    A = np.eye(n) * 2.0 + np.triu(rng.normal(size=(n, n)), 1) * 0.3
    d = np.abs(np.diag(A)) + 1.0
    b = rng.normal(size=n)
    Aj = jnp.asarray(A)
    dj = jnp.asarray(d)

    @dataclasses.dataclass(frozen=True)
    class DenseOp:
        A: jax.Array

        def vmult(self, v):
            return self.A @ v

    @dataclasses.dataclass(frozen=True)
    class DiagPrec:
        d: jax.Array

        def vmult(self, v):
            return v / self.d

    jax.tree_util.register_dataclass(DenseOp, data_fields=["A"],
                                     meta_fields=[])
    jax.tree_util.register_dataclass(DiagPrec, data_fields=["d"],
                                     meta_fields=[])

    mono = gmres_solve(lambda v: Aj @ v, jnp.asarray(b), m=10,
                       preconditioner=lambda v: v / dj,
                       reltol=1e-10, maxiter=400)
    host = gmres_solve_host(DenseOp(Aj), jnp.asarray(b),
                            preconditioner=DiagPrec(dj), m=10,
                            reltol=1e-10, maxiter=400)
    assert bool(host.converged)
    assert int(host.n_iterations) > 10  # restarted at least once
    x_m, x_h = np.asarray(mono.x), np.asarray(host.x)
    nb = np.linalg.norm(b)
    assert np.linalg.norm(A @ x_h - b) < 1e-8 * nb
    assert np.linalg.norm(x_m - x_h) < 1e-6 * np.linalg.norm(x_m)
    # unpreconditioned path too (IdentityPreconditioner default)
    host_id = gmres_solve_host(DenseOp(Aj), jnp.asarray(b), m=20,
                               reltol=1e-10, maxiter=400)
    assert np.linalg.norm(A @ np.asarray(host_id.x) - b) < 1e-8 * nb


def test_verify_true_residual_guard():
    """The guard accepts an honest solve and fires on a corrupted one."""
    import dataclasses

    import pytest

    rng = np.random.default_rng(13)
    n = 40
    A = np.eye(n) * 3.0 + rng.normal(size=(n, n)) * 0.2
    b = rng.normal(size=n)
    Aj = jnp.asarray(A)

    @dataclasses.dataclass(frozen=True)
    class DenseOp2:
        A: jax.Array

        def vmult(self, v):
            return self.A @ v

    jax.tree_util.register_dataclass(DenseOp2, data_fields=["A"],
                                     meta_fields=[])
    op = DenseOp2(Aj)
    res = gmres_solve(lambda v: Aj @ v, jnp.asarray(b), m=20, reltol=1e-10)
    verify_true_residual(op, jnp.asarray(b), res.x, res.residual_norm,
                         1e-10)  # must not raise
    # simulate a miscompile: claimed-converged x that is garbage
    with pytest.raises(RuntimeError, match="miscompil"):
        verify_true_residual(op, jnp.asarray(b), res.x * 2.0,
                             res.residual_norm, 1e-10)


def test_stokes_triangular_gmres_beats_blockdiag_minres():
    """The block upper-triangular preconditioner (same blocks) under GMRES
    must converge in well under half the block-diagonal MINRES count, to
    the same solution (Elman/Silvester/Wathen ch. 9)."""
    from dealii_multigrid_tpu.mesh import generators as G
    from dealii_multigrid_tpu.models import stokes as ST
    from dealii_multigrid_tpu.utils.params import MultigridParameters

    mesh = G.create("hypercube", 3, 2, 0)
    mg_data = MultigridParameters()
    mg_data.smoother.degree = 3
    mg_data.coarse_solver.type = "amg"
    op, block, aux = ST.build_stokes(mesh, mg_data, dtype=jnp.float64)
    tri = ST.triangular_preconditioner(op, block)
    n_v, n_p = op.n_v, op.n_p

    rng = np.random.default_rng(1)
    b = rng.normal(size=3 * n_v + n_p)
    b[: 3 * n_v] *= np.asarray(op.keep_v)
    b[3 * n_v :] -= b[3 * n_v :].mean()
    bj = jnp.asarray(b)

    xm, it_minres, _ = ST.minres_solve(
        op.vmult, bj, preconditioner=block.vmult, maxiter=200, reltol=1e-8
    )
    res = gmres_solve(
        op.vmult, bj, preconditioner=tri.vmult, m=60, reltol=1e-8,
        maxiter=200,
    )
    assert bool(res.converged)
    # measured r=2: GMRES-triangular ~32 vs MINRES-block-diagonal ~59 (both
    # with the consistent-mass Chebyshev Schur solve)
    assert int(res.n_iterations) <= int(0.7 * int(it_minres)), (
        int(res.n_iterations),
        int(it_minres),
    )

    xg = ST.project_pressure_mean(res.x, n_v, n_p)
    r_true = np.asarray(op.vmult(xg)) - b
    r_true[3 * n_v :] -= r_true[3 * n_v :].mean()
    assert np.linalg.norm(r_true) / np.linalg.norm(b) < 1e-6
