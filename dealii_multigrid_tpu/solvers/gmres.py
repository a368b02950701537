"""Right-preconditioned restarted GMRES(m), fully jittable.

The deal.II SolverGMRES equivalent (the reference's solver stack exposes
CG for the SPD Poisson benchmarks; GMRES serves the nonsymmetric /
block-triangular-preconditioned saddle solves of the mantle-convection
workload, models/stokes.py).  TPU-shaped: the Arnoldi basis lives as one
[m+1, n] matrix so orthogonalisation is two GEMVs against the whole
basis per step (masked modified-Gram-Schmidt — no dynamic shapes), the
Hessenberg/Givens bookkeeping is O(m^2) scalars, and the whole solve is
one lax.while_loop program.

Right preconditioning keeps the residual the TRUE residual (no M-norm
ambiguity): solve A M u = b, x = M u.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


class GMRESResult(NamedTuple):
    x: jax.Array
    n_iterations: jax.Array   # i32, total Arnoldi steps across restarts
    residual_norm: jax.Array
    converged: jax.Array


def gmres_solve(
    a_vmult: Callable,
    b: jax.Array,
    preconditioner: Callable | None = None,
    m: int = 30,
    maxiter: int = 1000,
    abstol: float = 1e-50,
    reltol: float = 1e-8,
) -> GMRESResult:
    """Solve A x = b by GMRES(m) with right preconditioner M (any linear
    map; identity if None).  Stops when the true residual satisfies
    ||b - A x|| <= max(abstol, reltol * ||b||) (ReductionControl
    semantics), or after ``maxiter`` total Arnoldi steps."""
    if preconditioner is None:
        preconditioner = lambda r: r

    n = b.shape[0]
    dtype = b.dtype
    norm_b = jnp.sqrt(jnp.sum(b * b))
    tol = jnp.maximum(jnp.asarray(abstol, dtype), reltol * norm_b)

    def arnoldi_cycle(x0):
        """One restart cycle from iterate x0; returns (x, steps, res)."""
        r = b - a_vmult(x0)
        beta = jnp.sqrt(jnp.sum(r * r))

        V = jnp.zeros((m + 1, n), dtype)
        V = V.at[0].set(jnp.where(beta > 0, r / jnp.maximum(beta, 1e-300), r))
        H = jnp.zeros((m + 1, m), dtype)
        cs = jnp.zeros(m, dtype)
        sn = jnp.zeros(m, dtype)
        g = jnp.zeros(m + 1, dtype).at[0].set(beta)

        def cond(st):
            V, H, cs, sn, g, j, res = st
            return (res > tol) & (j < m)

        def body(st):
            V, H, cs, sn, g, j, res = st
            w = a_vmult(preconditioner(V[j]))
            # masked modified Gram-Schmidt: project against rows 0..j in one
            # GEMV pair (rows > j are zero, their dots are harmless but
            # masked anyway for exactness)
            mask = (jnp.arange(m + 1) <= j).astype(dtype)
            h = (V @ w) * mask
            w = w - h @ V
            # one re-orthogonalisation pass (classical twice = numerically
            # modified): cheap insurance at m ~ 30
            h2 = (V @ w) * mask
            w = w - h2 @ V
            h = h + h2
            hnext = jnp.sqrt(jnp.sum(w * w))
            V = V.at[j + 1].set(w / jnp.maximum(hnext, 1e-300))
            col = h.at[j + 1].set(hnext)

            # apply the accumulated Givens rotations to the new column
            def rot(i, c):
                ci, si = cs[i], sn[i]
                applied = (
                    c.at[i].set(ci * c[i] + si * c[i + 1])
                    .at[i + 1].set(-si * c[i] + ci * c[i + 1])
                )
                return jnp.where(i < j, applied, c)

            col = jax.lax.fori_loop(0, m, rot, col)
            # new rotation annihilating col[j+1]
            a0, a1 = col[j], col[j + 1]
            rr = jnp.sqrt(a0 * a0 + a1 * a1)
            c_new = jnp.where(rr > 0, a0 / jnp.maximum(rr, 1e-300), 1.0)
            s_new = jnp.where(rr > 0, a1 / jnp.maximum(rr, 1e-300), 0.0)
            col = col.at[j].set(rr).at[j + 1].set(0.0)
            cs = cs.at[j].set(c_new)
            sn = sn.at[j].set(s_new)
            g = g.at[j + 1].set(-s_new * g[j]).at[j].set(c_new * g[j])
            H = H.at[:, j].set(col)
            return (V, H, cs, sn, g, j + 1, jnp.abs(g[j + 1]))

        V, H, cs, sn, g, j, res = jax.lax.while_loop(
            cond, body, (V, H, cs, sn, g, jnp.asarray(0, jnp.int32), beta)
        )

        # solve the (padded) triangular system R y = g for the first j
        # columns: unused rows get a unit diagonal and zero rhs, so their y
        # components vanish and the update is exact for any j
        idx = jnp.arange(m)
        R = H[:m, :] + jnp.diag(jnp.where(idx < j, 0.0, 1.0).astype(dtype))
        rhs = jnp.where(idx < j, g[:m], 0.0)
        y = jax.scipy.linalg.solve_triangular(R, rhs, lower=False)
        x = x0 + preconditioner(y @ V[:m])
        return x, j, res

    def cond(st):
        x, it, res, stall = st
        return (res > tol) & (it < maxiter) & (~stall)

    def body(st):
        x, it, res, _ = st
        x, j, res_new = arnoldi_cycle(x)
        # a cycle that makes no progress (j == 0 or no residual reduction)
        # cannot improve on restart: bail out instead of spinning
        stall = (j == 0) | (res_new >= res)
        return (x, it + j, res_new, stall)

    x0 = jnp.zeros_like(b)
    state = (x0, jnp.asarray(0, jnp.int32), norm_b, jnp.asarray(False))
    x, it, res, _ = jax.lax.while_loop(cond, body, state)
    return GMRESResult(x, it, res, res <= tol)
