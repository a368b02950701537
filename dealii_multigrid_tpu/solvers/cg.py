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
    return CGResult(x, it, res, res <= tol)
