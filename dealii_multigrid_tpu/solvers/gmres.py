"""Flexible right-preconditioned restarted GMRES(m), fully jittable.

The deal.II SolverGMRES/SolverFGMRES equivalent (the reference's solver
stack exposes CG for the SPD Poisson benchmarks; GMRES serves the
nonsymmetric / block-triangular-preconditioned saddle solves of the
mantle-convection workload, models/stokes.py).  TPU-shaped: the Arnoldi
basis lives as one [m+1, n] matrix so orthogonalisation is two GEMVs
against the whole basis per step (masked modified-Gram-Schmidt — no
dynamic shapes), the Hessenberg/Givens bookkeeping is O(m^2) scalars,
and the whole solve is one lax.while_loop program.

Right preconditioning keeps the residual the TRUE residual (no M-norm
ambiguity).  FLEXIBLE variant (Saad 1993): the preconditioned vectors
z_j = M v_j are stored and the update is x += Z y — not x += M(V y).
With an exactly linear M the two are identical; our production M (GMG
V-cycles with f32 level solves inside an f64 outer) is linear only to
~1e-10 relative, and plain right-preconditioning lets that error break
the Givens-recurrence/true-residual agreement by orders of magnitude
over a restart cycle (measured 120x on the nsinker row, round-5).
FGMRES makes the recurrence exact for whatever M actually did, at the
cost of one extra [m, n] buffer.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
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
        Z = jnp.zeros((m, n), dtype)  # flexible: stored M v_j
        H = jnp.zeros((m + 1, m), dtype)
        cs = jnp.zeros(m, dtype)
        sn = jnp.zeros(m, dtype)
        g = jnp.zeros(m + 1, dtype).at[0].set(beta)

        def cond(st):
            V, Z, H, cs, sn, g, j, res = st
            return (res > tol) & (j < m)

        def body(st):
            V, Z, H, cs, sn, g, j, res = st
            z = preconditioner(V[j])
            Z = Z.at[j].set(z)
            w = a_vmult(z)
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
            return (V, Z, H, cs, sn, g, j + 1, jnp.abs(g[j + 1]))

        V, Z, H, cs, sn, g, j, res = jax.lax.while_loop(
            cond, body, (V, Z, H, cs, sn, g, jnp.asarray(0, jnp.int32), beta)
        )

        # solve the (padded) triangular system R y = g for the first j
        # columns: unused rows get a unit diagonal and zero rhs, so their y
        # components vanish and the update is exact for any j
        idx = jnp.arange(m)
        R = H[:m, :] + jnp.diag(jnp.where(idx < j, 0.0, 1.0).astype(dtype))
        rhs = jnp.where(idx < j, g[:m], 0.0)
        y = jax.scipy.linalg.solve_triangular(R, rhs, lower=False)
        x = x0 + y @ Z  # flexible update: the stored z_j, not M(V y)
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


# --------------------------------------------------------------------------
# Miscompile hardening.  gmres_solve above is exactly the program shape the
# axon XLA backend has been observed to miscompile (a multi-iteration
# lax.while_loop with the V-cycle inside, CLAUDE.md "gotchas"), and its
# reported residual comes from the Givens recurrence — a miscompile would
# return silently wrong solutions.  Two defenses, mirroring api.mg_solve:
#   * verify_true_residual: recompute ||b - A x|| in its OWN
#     single-application program (the granularity verified bit-exact
#     against CPU) and raise on disagreement.
#   * gmres_solve_host: one jitted program per A/M application (host
#     Arnoldi bookkeeping) — the fallback that cannot hit the miscompile.


@dataclass(frozen=True)
class IdentityPreconditioner:
    def vmult(self, r):
        return r

    __call__ = vmult


jax.tree_util.register_dataclass(
    IdentityPreconditioner, data_fields=[], meta_fields=[]
)


@jax.jit
def _true_residual_norm(fop, b, x):
    r = b - fop.vmult(x)
    return jnp.sqrt(jnp.sum(r * r))


def verify_true_residual(fop, b, x, claimed_res, reltol, abstol=1e-50,
                         context="gmres"):
    """Recompute ||b - A x|| as a single-application program and require
    agreement with the solver's claimed residual (floor-aware: the
    attainable true residual stalls at ~eps_op * ||b|| under f32
    operators — expected, not a miscompile).  Returns the true residual;
    raises RuntimeError on disagreement beyond 10x + floor."""
    true_res = float(_true_residual_norm(fop, b, x))
    norm_b = float(jnp.sqrt(jnp.sum(b * b)))
    eps_op = float(jnp.finfo(getattr(fop, "dtype", b.dtype)).eps)
    floor = 1e4 * eps_op * norm_b
    tol_abs = max(abstol, reltol * norm_b)
    threshold = 10.0 * max(tol_abs, float(claimed_res)) + floor
    if true_res > threshold:
        raise RuntimeError(
            f"{context}: recurrence residual disagrees with the recomputed "
            f"true residual (claimed {float(claimed_res):.3e} vs true "
            f"{true_res:.3e}, ||b|| {norm_b:.3e}, allowance "
            f"{threshold:.3e}): suspected axon XLA while-loop "
            "miscompilation — rerun with gmres_solve_host (one jitted "
            "application per dispatch)"
        )
    return true_res


@jax.jit
def _host_apply(fop, precond, v):
    """Returns (z, w) = (M v, A M v) — z is stored for the flexible update."""
    z = precond.vmult(v)
    return z, fop.vmult(z)


@jax.jit
def _host_residual(fop, b, x):
    r = b - fop.vmult(x)
    return r, jnp.sqrt(jnp.sum(r * r))


@jax.jit
def _host_start(V, r, beta):
    v0 = jnp.where(beta > 0, r / jnp.maximum(beta, 1e-300), r)
    return (V * 0).at[0].set(v0)


@jax.jit
def _host_orth(V, w, j):
    """Masked two-pass MGS of w against rows 0..j of V; writes v_{j+1}.
    Pure GEMV pairs — no solver applications, no iteration chain."""
    mask = (jnp.arange(V.shape[0]) <= j).astype(V.dtype)
    h = (V @ w) * mask
    w = w - h @ V
    h2 = (V @ w) * mask
    w = w - h2 @ V
    h = h + h2
    hnext = jnp.sqrt(jnp.sum(w * w))
    V = V.at[j + 1].set(w / jnp.maximum(hnext, 1e-300))
    return V, h, hnext


@jax.jit
def _host_form_update(Z, y, x):
    return x + y @ Z  # flexible: the stored z_j, not M(V y)


def gmres_solve_host(
    fop,
    b: jax.Array,
    preconditioner=None,
    m: int = 30,
    maxiter: int = 1000,
    abstol: float = 1e-50,
    reltol: float = 1e-8,
    check: bool = True,
) -> GMRESResult:
    """Flexible GMRES(m) with identical algebra to gmres_solve, but each
    A / M application is its own jitted program (operators as pytree
    ARGUMENTS) and the Arnoldi/Givens bookkeeping runs on the host in f64.

    ``fop`` / ``preconditioner`` follow the operator-pytree protocol
    (``.vmult``; see cg_solve_host).  Safe on the axon backend at the cost
    of ~2 dispatches per Arnoldi step."""
    import numpy as np

    if preconditioner is None:
        preconditioner = IdentityPreconditioner()
    dtype = b.dtype
    norm_b = float(jnp.sqrt(jnp.sum(b * b)))
    tol = max(abstol, reltol * norm_b)

    x = jnp.zeros_like(b)
    total = 0
    res = norm_b
    res_prev_cycle = float("inf")
    converged = res <= tol
    while not converged and total < maxiter:
        r, beta_dev = _host_residual(fop, b, x)
        beta = float(beta_dev)
        res = beta
        if res <= tol:
            converged = True
            break
        if beta >= res_prev_cycle:  # no progress over the last full cycle
            break
        res_prev_cycle = beta
        V = _host_start(jnp.zeros((m + 1, b.shape[0]), dtype), r, beta_dev)
        Z = jnp.zeros((m, b.shape[0]), dtype)  # flexible: stored M v_j
        H = np.zeros((m + 1, m))
        cs = np.zeros(m)
        sn = np.zeros(m)
        g = np.zeros(m + 1)
        g[0] = beta
        j = 0
        while j < m and res > tol and total + j < maxiter:
            z, w = _host_apply(fop, preconditioner, V[j])
            Z = Z.at[j].set(z)
            V, h_dev, hnext_dev = _host_orth(V, w, jnp.asarray(j, jnp.int32))
            col = np.array(h_dev, np.float64)  # copy: asarray views are read-only
            col[j + 1] = float(hnext_dev)
            for i in range(j):
                ci, si = cs[i], sn[i]
                col[i], col[i + 1] = (ci * col[i] + si * col[i + 1],
                                      -si * col[i] + ci * col[i + 1])
            rr = float(np.hypot(col[j], col[j + 1]))
            c_new = col[j] / rr if rr > 0 else 1.0
            s_new = col[j + 1] / rr if rr > 0 else 0.0
            col[j], col[j + 1] = rr, 0.0
            cs[j], sn[j] = c_new, s_new
            g[j + 1] = -s_new * g[j]
            g[j] = c_new * g[j]
            H[:, j] = col
            j += 1
            res = abs(g[j])
        total += j
        if j > 0:
            y = np.zeros(m)
            y[:j] = np.linalg.solve(H[:j, :j], g[:j])
            x = _host_form_update(Z, jnp.asarray(y, dtype), x)
        else:
            break
        converged = res <= tol
    if check:
        # raises on disagreement; the returned true residual may stall just
        # above tol at the f32 operator floor — report it, keep the
        # recurrence's convergence verdict (verify_true_residual already
        # bounded the gap)
        res = verify_true_residual(fop, b, x, res, reltol, abstol,
                                   context="gmres_solve_host")
    return GMRESResult(
        x,
        jnp.asarray(total, jnp.int32),
        jnp.asarray(res, dtype),
        jnp.asarray(bool(converged)),
    )
