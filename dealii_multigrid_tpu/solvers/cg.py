"""Preconditioned conjugate gradients with deal.II ReductionControl semantics.

Mirrors SolverCG + ReductionControl usage (reference:
multigrid_throughput.cc:1143-1145, 1238-1254): stop when ||r|| <=
max(abstol, reltol * ||r0||); report the iteration count (a first-class
benchmark output column).  Implemented as a jittable lax.while_loop; the whole
solve is one XLA computation with no host round-trips.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


class CGResult(NamedTuple):
    x: jax.Array
    n_iterations: jax.Array  # i32 scalar
    residual_norm: jax.Array
    converged: jax.Array     # bool scalar
    norm0: jax.Array | None = None  # ||r0|| (= ||b|| for x0=0); guard input


def cg_solve(
    a_vmult: Callable,
    b: jax.Array,
    preconditioner: Callable | None = None,
    x0: jax.Array | None = None,
    maxiter: int = 10000,
    abstol: float = 1e-20,
    reltol: float = 1e-4,
    force_iterations: int | None = None,
    dot: Callable | None = None,
) -> CGResult:
    """Solve A x = b by PCG.

    ``force_iterations`` reproduces the reference's fixed-work parameter-study
    mode (exactly N iterations, tolerances effectively zero —
    multigrid_throughput.cc:325-332).
    """
    if preconditioner is None:
        preconditioner = lambda r: r
    if dot is None:
        # elementwise multiply + VPU reduction: jnp.vdot would go through the
        # MXU at bf16 input precision on TPU
        dot = lambda a, b: jnp.sum(a * b)
    norm = lambda v: jnp.sqrt(dot(v, v).real)
    if x0 is None:
        x = jnp.zeros_like(b)
        r = b
    else:
        x = x0
        r = b - a_vmult(x0)

    norm0 = norm(r)
    if force_iterations is not None:
        tol = jnp.asarray(0.0, b.dtype)
        maxiter = force_iterations
    else:
        tol = jnp.maximum(jnp.asarray(abstol, norm0.dtype), reltol * norm0)

    z = preconditioner(r)
    rz = dot(r, z)

    def cond(state):
        x, r, z, p, rz, it, res = state
        return (res > tol.astype(res.dtype)) & (it < maxiter)

    def body(state):
        x, r, z, p, rz, it, res = state
        ap = a_vmult(p)
        # scalars may be computed in higher precision (f64 dots under an f32
        # solve); cast back for the vector updates
        alpha = (rz / dot(p, ap)).astype(x.dtype)
        x = x + alpha * p
        r = r - alpha * ap
        z = preconditioner(r)
        rz_new = dot(r, z)
        beta = (rz_new / rz).astype(x.dtype)
        p = z + beta * p
        return (x, r, z, p, rz_new, it + 1, norm(r).astype(res.dtype))

    state = (x, r, z, z, rz, jnp.asarray(0, jnp.int32), norm0)
    x, r, z, p, rz, it, res = jax.lax.while_loop(cond, body, state)
    return CGResult(x, it, res, res <= tol, norm0)


@partial(jax.jit, static_argnames=("use_op_dot",))
def _cg_host_init(fop, precond, b, use_op_dot):
    dot = fop.dot if use_op_dot else (lambda a, c: jnp.sum(a * c))
    r = b
    z = precond.vmult(r)
    rz = dot(r, z)
    return r, z, rz, jnp.sqrt(dot(r, r).real)


@partial(jax.jit, static_argnames=("use_op_dot",))
def _cg_host_step(fop, precond, x, r, p, rz, use_op_dot):
    """One PCG iteration as its own program (one A apply + one M apply)."""
    dot = fop.dot if use_op_dot else (lambda a, c: jnp.sum(a * c))
    ap = fop.vmult(p)
    alpha = (rz / dot(p, ap)).astype(x.dtype)
    x = x + alpha * p
    r = r - alpha * ap
    z = precond.vmult(r)
    rz_new = dot(r, z)
    beta = (rz_new / rz).astype(x.dtype)
    p = z + beta * p
    return x, r, p, rz_new, jnp.sqrt(dot(r, r).real)


def cg_solve_host(
    fop,
    b: jax.Array,
    preconditioner,
    maxiter: int = 10000,
    abstol: float = 1e-20,
    reltol: float = 1e-4,
    force_iterations: int | None = None,
    use_op_dot: bool = False,
) -> CGResult:
    """PCG as a host loop over one jitted step per iteration.

    Identical algebra to cg_solve, but each iteration is its own XLA
    program.  Workaround for an XLA-TPU (axon) miscompilation of large
    multi-iteration programs containing the local-smoothing V-cycle: the
    single-application granularity is verified bit-exact against the CPU
    backend, while the same chain inside one program computes inconsistent
    loop state (see api.mg_solve docstring).

    Depth-1 pipelined: step k+1 is DISPATCHED (async, on the step-k output
    futures) before step k's residual scalar is fetched, so the ~35 ms
    axon tunnel round-trip per iteration overlaps the next iteration's
    device execution instead of serializing with it.  At convergence the
    one speculatively dispatched step is discarded (its result is never
    used; x_k with ||r_k|| <= tol is returned — identical iterates and
    iteration counts to the sequential loop)."""
    r, z, rz, norm0 = _cg_host_init(fop, preconditioner, b, use_op_dot)
    if force_iterations is not None:
        tol = 0.0
        maxiter = force_iterations
    else:
        tol = max(abstol, reltol * float(norm0))
    x = jnp.zeros_like(b)
    res = float(norm0)
    if res <= tol or maxiter <= 0:
        return CGResult(
            x, jnp.asarray(0, jnp.int32), jnp.asarray(res, b.dtype),
            jnp.asarray(res <= tol), norm0,
        )
    it = 0
    # step 1 in flight; x_cur/res track the last CHECKED state
    step = _cg_host_step(fop, preconditioner, x, r, z, rz, use_op_dot)
    x_cur = x
    while res > tol and it < maxiter:
        nxt = (
            _cg_host_step(
                fop, preconditioner, step[0], step[1], step[2], step[3],
                use_op_dot,
            )
            if it + 1 < maxiter
            else None
        )
        res = float(step[4])  # sync on step it+1 while step it+2 executes
        x_cur = step[0]
        it += 1
        step = nxt
    return CGResult(
        x_cur,
        jnp.asarray(it, jnp.int32),
        jnp.asarray(res, b.dtype),
        jnp.asarray(res <= tol),
        norm0,
    )
