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

import os

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

    nrm2 = dot(r, r)
    norm0 = jnp.sqrt(nrm2.real)
    if force_iterations is not None:
        tol = jnp.asarray(0.0, b.dtype)
        maxiter = force_iterations
    else:
        tol = jnp.maximum(jnp.asarray(abstol, norm0.dtype), reltol * norm0)

    # deal.II SolverCG ordering (solver_cg.h): the preconditioner applies at
    # the START of the body, AFTER the convergence test on the fresh
    # residual — so a converged solve does exactly n_it M-applies, not
    # n_it + 1.  At bench scale the V-cycle is ~145 ms, ~20% of a
    # 3-iteration solve (measured round-4c).  beta is masked to 0 on the
    # first iteration (rz carries ||r0||^2, a nonzero placeholder).

    def cond(state):
        x, r, p, rz, it, res = state
        return (res > tol.astype(res.dtype)) & (it < maxiter)

    def body(state):
        x, r, p, rz, it, res = state
        z = preconditioner(r)
        rz_new = dot(r, z)
        # scalars may be computed in higher precision (f64 dots under an f32
        # solve); cast back for the vector updates
        beta = jnp.where(it == 0, jnp.zeros_like(rz_new), rz_new / rz).astype(
            x.dtype
        )
        p = z + beta * p
        ap = a_vmult(p)
        alpha = (rz_new / dot(p, ap)).astype(x.dtype)
        x = x + alpha * p
        r = r - alpha * ap
        return (x, r, p, rz_new, it + 1, norm(r).astype(res.dtype))

    state = (x, r, jnp.zeros_like(x), nrm2, jnp.asarray(0, jnp.int32), norm0)
    x, r, p, rz, it, res = jax.lax.while_loop(cond, body, state)
    return CGResult(x, it, res, res <= tol, norm0)


def _pcg_masked_step(fop, precond, state, tol, maxiter, dot):
    """One PCG iteration that freezes once converged (or at maxiter).

    Applies the identical update as cg_solve's body (deal.II ordering:
    M-apply first, masked on the convergence test), then keeps the OLD
    state where the convergence test already held — so an unrolled chain
    of these steps produces bit-identical iterates and iteration counts
    to the while_loop, paying only wasted (discarded) flops on the steps
    past convergence inside the final chunk."""
    x, r, p, rz, it, res = state
    active = (res > tol.astype(res.dtype)) & (it < maxiter)
    z = precond.vmult(r)
    rz2 = dot(r, z)
    beta = jnp.where(it == 0, jnp.zeros_like(rz2), rz2 / rz).astype(x.dtype)
    p2 = z + beta * p
    ap = fop.vmult(p2)
    alpha = (rz2 / dot(p2, ap)).astype(x.dtype)
    x2 = x + alpha * p2
    r2 = r - alpha * ap
    res2 = jnp.sqrt(dot(r2, r2).real).astype(res.dtype)
    sel = lambda n, o: jnp.where(active, n, o)
    return (
        sel(x2, x), sel(r2, r), sel(p2, p),
        jnp.where(active, rz2, rz),
        it + active.astype(it.dtype),
        jnp.where(active, res2, res),
    )


@partial(jax.jit, static_argnames=("k", "use_op_dot"))
def _cg_chain_first(fop, precond, b, abstol, reltol, maxiter, k, use_op_dot):
    """CG init + k unrolled masked PCG iterations in ONE program."""
    dot = fop.dot if use_op_dot else (lambda a, c: jnp.sum(a * c))
    x = jnp.zeros_like(b)
    r = b
    nrm2 = dot(r, r)
    norm0 = jnp.sqrt(nrm2.real)
    tol = jnp.maximum(
        jnp.asarray(abstol, norm0.dtype), jnp.asarray(reltol, norm0.dtype) * norm0
    )
    state = (x, r, jnp.zeros_like(x), nrm2, jnp.asarray(0, jnp.int32), norm0)
    for _ in range(k):
        state = _pcg_masked_step(fop, precond, state, tol, maxiter, dot)
    return state, norm0, tol


@partial(jax.jit, static_argnames=("k", "use_op_dot"))
def _cg_chain_more(fop, precond, state, tol, maxiter, k, use_op_dot):
    dot = fop.dot if use_op_dot else (lambda a, c: jnp.sum(a * c))
    for _ in range(k):
        state = _pcg_masked_step(fop, precond, state, tol, maxiter, dot)
    return state


def cg_solve_chain(
    fop,
    b: jax.Array,
    preconditioner,
    maxiter: int = 10000,
    abstol: float = 1e-20,
    reltol: float = 1e-4,
    force_iterations: int | None = None,
    use_op_dot: bool = False,
    k0: int = 3,
) -> CGResult:
    """PCG as a host loop over CHUNKS of unrolled iterations.

    Motivation (measured, RESULTS.md round-4c probe_cg_loop at quadrant
    r=7/p=4): the monolithic lax.while_loop program pays a ~170 ms FIXED
    cost over the identical unrolled chain on the axon TPU backend
    (chain t(3)=579 ms vs while t(3)=736 ms; per-iteration costs match at
    ~180 ms), while a one-step-per-dispatch host loop pays the ~35 ms
    tunnel latency per iteration.  The chunked chain gets the best of
    both: the first k0 iterations (k0 = expected count, e.g. 3 for the
    quadrant benchmark family) run as one dispatch with the convergence
    test masked in (``_pcg_masked_step``), then any leftover iterations
    run one per dispatch.  Identical iterates and iteration counts to
    cg_solve; past-convergence steps inside a chunk are computed and
    discarded (masked), so oversizing k0 wastes device flops but never
    changes the result.
    """
    if force_iterations is not None:
        abstol_, reltol_, maxiter = 0.0, 0.0, force_iterations
    else:
        abstol_, reltol_ = abstol, reltol
    k0 = max(1, min(k0, max(maxiter, 1)))
    state, norm0, tol = _cg_chain_first(
        fop, preconditioner, b, abstol_, reltol_, maxiter, k0, use_op_dot
    )
    it, res, tol_f = jax.device_get((state[4], state[5], tol))
    it, res, tol_f = int(it), float(res), float(tol_f)
    while res > tol_f and it < maxiter:
        state = _cg_chain_more(
            fop, preconditioner, state, tol, maxiter, 1, use_op_dot
        )
        it, res = jax.device_get((state[4], state[5]))
        it, res = int(it), float(res)
    return CGResult(
        state[0],
        jnp.asarray(it, jnp.int32),
        jnp.asarray(res, b.dtype),
        jnp.asarray(res <= tol_f),
        norm0,
    )


@partial(jax.jit, static_argnames=("use_op_dot",))
def _cg_host_init(fop, b, use_op_dot):
    dot = fop.dot if use_op_dot else (lambda a, c: jnp.sum(a * c))
    nrm2 = dot(b, b)
    return nrm2, jnp.sqrt(nrm2.real)


def _cg_host_step_impl(fop, precond, x, r, p, rz, it, use_op_dot):
    """One PCG iteration as its own program (one M apply + one A apply,
    deal.II ordering — see cg_solve).  ``it`` masks beta to 0 on the first
    iteration (rz then carries the nonzero ||r0||^2 placeholder)."""
    dot = fop.dot if use_op_dot else (lambda a, c: jnp.sum(a * c))
    z = precond.vmult(r)
    rz_new = dot(r, z)
    beta = jnp.where(it == 0, jnp.zeros_like(rz_new), rz_new / rz).astype(
        x.dtype
    )
    p = z + beta * p
    ap = fop.vmult(p)
    alpha = (rz_new / dot(p, ap)).astype(x.dtype)
    x = x + alpha * p
    r = r - alpha * ap
    return x, r, p, rz_new, jnp.sqrt(dot(r, r).real)


_cg_host_step = partial(
    jax.jit, static_argnames=("use_op_dot",)
)(_cg_host_step_impl)
# Donating variant for the sync-per-step (MGTPU_CG_NO_PIPELINE) loop:
# x/r/p inputs are the PREVIOUS step's outputs and dead after the call, so
# XLA may alias them — 3 fewer live volumes (~1.7 GB at the r=8/p=4
# envelope).  NEVER used for the first step (its r input IS the caller's
# rhs) nor in the pipelined loop (the speculative dispatch would donate
# buffers the caller still reads at convergence).
_cg_host_step_donated = partial(
    jax.jit, static_argnames=("use_op_dot",), donate_argnums=(2, 3, 4)
)(_cg_host_step_impl)


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
    rz0, norm0 = _cg_host_init(fop, b, use_op_dot)
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
    step = _cg_host_step(
        fop, preconditioner, x, b, jnp.zeros_like(x), rz0, 0, use_op_dot
    )
    x_cur = x
    # MGTPU_CG_NO_PIPELINE=1 syncs each step before dispatching the next:
    # the depth-1 pipeline keeps TWO steps' full state live, which is the
    # difference between fitting and RESOURCE_EXHAUSTED at the r=8/p=4
    # envelope (138M DoF, ~576 MB/volume — round-5 probe).  Costs the
    # ~35 ms tunnel round-trip per iteration it exists to hide.
    no_pipe = os.environ.get("MGTPU_CG_NO_PIPELINE", "") not in ("", "0")
    while res > tol and it < maxiter:
        nxt = (
            _cg_host_step(
                fop, preconditioner, step[0], step[1], step[2], step[3],
                it + 1, use_op_dot,
            )
            if (not no_pipe and it + 1 < maxiter)
            else None
        )
        res = float(step[4])  # sync on step it+1 while step it+2 executes
        x_cur = step[0]
        it += 1
        if no_pipe and res > tol and it < maxiter:
            # inputs are the just-checked step's outputs — dead after this
            # dispatch, so donate them (x_cur is only read at convergence,
            # when no further dispatch has consumed it)
            nxt = _cg_host_step_donated(
                fop, preconditioner, step[0], step[1], step[2], step[3],
                it, use_op_dot,
            )
        step = nxt
    return CGResult(
        x_cur,
        jnp.asarray(it, jnp.int32),
        jnp.asarray(res, b.dtype),
        jnp.asarray(res <= tol),
        norm0,
    )
