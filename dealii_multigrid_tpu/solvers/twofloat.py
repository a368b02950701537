"""Double-single (f32x2) compensated arithmetic for the outer CG.

TPU v5e has no native f64 path: XLA emulates double arithmetic in
software, which makes the reference's benchmarked precision instantiation
run<3, 1, double, float> (multigrid_throughput.cc:2430-2433) ~2.8x slower
here than the float row even though the operator/V-cycle work is identical
f32 (BENCH_r02 mixed row).  This module recovers double-like Krylov
RECURSION accuracy at f32 speed the TPU-native way: each outer vector is
an unevaluated pair (hi, lo) of f32 arrays with |lo| <= ulp(hi)/2, and the
x/r/p updates run error-free transformations (Knuth two_sum, Dekker
two_prod) on the VPU — ~53 effective mantissa bits for the vector
recursion, plain f32 for the operator and V-cycle applications, exactly
the boundary the existing NumberType=mixed mode draws
(api.MixedPrecisionOperator: f64 vectors around an f32 vmult).

Dots are compensated products tree-reduced in f32.  The CG scalars
(alpha, beta, ||r||) are POSITIVE well-conditioned sums, so an f32 tree
reduction carries ~1e-7 relative error regardless of magnitude — plenty
for the direction updates and the stopping test; what limits attainable
accuracy in mixed-precision CG is the vector recursion and the matvec
precision, and the recursion is exactly what the pairs fix.  No
jax_enable_x64 anywhere on the device path.

References: Dekker 1971 (error-free splitting), Ogita/Rump/Oishi 2005
(compensated dot), and the mixed-precision CG boundary of
multigrid_throughput.cc:1140-1268 (double outer vectors, float levels).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from .cg import CGResult

# Dekker splitting constant for f32: 2^12 + 1 (splits a 24-bit mantissa
# into two 12-bit halves so the half-products are exact in f32).  The
# split overflows for |a| > ~8e34 (f32max / 4097) — 4 orders of magnitude
# above any Krylov vector this solver produces; no rescaling needed.
_SPLIT = jnp.float32(4097.0)


class TF(NamedTuple):
    """A double-single value: hi + lo with |lo| <= ulp(hi)/2 (normalized)."""

    hi: jax.Array
    lo: jax.Array


def two_sum(a, b):
    """Error-free sum: s = fl(a+b), e exact error (Knuth, branch-free)."""
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def fast_two_sum(a, b):
    """Error-free sum assuming |a| >= |b| (Dekker)."""
    s = a + b
    e = b - (s - a)
    return s, e


def two_prod(a, b):
    """Error-free product via Dekker splitting (no FMA primitive in XLA's
    jnp surface): p = fl(a*b), e exact error."""
    p = a * b
    ah_t = _SPLIT * a
    ah = ah_t - (ah_t - a)
    al = a - ah
    bh_t = _SPLIT * b
    bh = bh_t - (bh_t - b)
    bl = b - bh
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


def tf_zeros_like(x: jax.Array) -> TF:
    z = jnp.zeros_like(x, dtype=jnp.float32)
    return TF(z, z)


def tf_from_f32(x: jax.Array) -> TF:
    x = x.astype(jnp.float32)
    return TF(x, jnp.zeros_like(x))


def tf_split_f64_host(x) -> TF:
    """Split a host f64 array into a double-single pair (setup-time only;
    the device path never touches f64)."""
    import numpy as np

    hi = np.asarray(x, dtype=np.float64).astype(np.float32)
    lo = (np.asarray(x, dtype=np.float64) - hi.astype(np.float64)).astype(
        np.float32
    )
    return TF(jnp.asarray(hi), jnp.asarray(lo))


def tf_round(x: TF) -> jax.Array:
    """Round the pair to the nearest f32 (hi absorbs lo under normalization,
    but add anyway so un-normalized pairs round correctly)."""
    return x.hi + x.lo


def tf_to_f64(x: TF):
    """Exact f64 view (tests / error studies; requires x64 on the caller)."""
    return x.hi.astype(jnp.float64) + x.lo.astype(jnp.float64)


def tf_add(x: TF, y: TF) -> TF:
    """Double-single addition (sloppy dd-add: ~2^-47 relative)."""
    s, e = two_sum(x.hi, y.hi)
    e = e + (x.lo + y.lo)
    hi, lo = fast_two_sum(s, e)
    return TF(hi, lo)


def tf_axpy(alpha, p: TF, x: TF) -> TF:
    """x + alpha * p with alpha an f32 scalar: two_prod keeps the product
    error, then a dd-add folds it into x."""
    alpha = jnp.asarray(alpha, jnp.float32)
    ph, pe = two_prod(alpha, p.hi)
    pe = pe + alpha * p.lo
    s, e = two_sum(x.hi, ph)
    e = e + (x.lo + pe)
    hi, lo = fast_two_sum(s, e)
    return TF(hi, lo)


def tf_axpy_f32(alpha, v: jax.Array, x: TF) -> TF:
    """x + alpha * v with v a plain f32 array (operator output)."""
    alpha = jnp.asarray(alpha, jnp.float32)
    ph, pe = two_prod(alpha, v)
    s, e = two_sum(x.hi, ph)
    e = e + (x.lo + pe)
    hi, lo = fast_two_sum(s, e)
    return TF(hi, lo)


def tf_xpby(z: jax.Array, beta, p: TF) -> TF:
    """z + beta * p with z plain f32 (preconditioner output): the CG
    direction update."""
    beta = jnp.asarray(beta, jnp.float32)
    ph, pe = two_prod(beta, p.hi)
    pe = pe + beta * p.lo
    s, e = two_sum(z, ph)
    e = e + pe
    hi, lo = fast_two_sum(s, e)
    return TF(hi, lo)


def _csum(h: jax.Array, c: jax.Array):
    """Reduce a compensated product stream: sum the exact high parts and
    the collected error terms separately (both f32 tree reductions), then
    combine.  Positive-dominated CG sums keep this at ~1e-7 relative."""
    return jnp.sum(h) + jnp.sum(c)


def tf_dot(a: TF, b: TF, weight: jax.Array | None = None) -> jax.Array:
    """Compensated dot of two double-single vectors -> f32 scalar.

    Elementwise products of the hi parts are error-free (two_prod); the
    error terms and the hi*lo cross terms are collected in f32 (they sit
    ~2^-24 below the main sum).  ``weight`` multiplies elementwise
    (ownership mask for sharded dots)."""
    h, e = two_prod(a.hi, b.hi)
    c = e + (a.hi * b.lo + a.lo * b.hi)
    if weight is not None:
        w = weight.astype(jnp.float32)
        h = h * w
        c = c * w
    return _csum(h, c)


def tf_dot_f32(a: TF, v: jax.Array, weight: jax.Array | None = None) -> jax.Array:
    """Compensated dot of a double-single vector with a plain f32 vector."""
    h, e = two_prod(a.hi, v)
    c = e + a.lo * v
    if weight is not None:
        w = weight.astype(jnp.float32)
        h = h * w
        c = c * w
    return _csum(h, c)


def tf_norm(a: TF, weight: jax.Array | None = None) -> jax.Array:
    return jnp.sqrt(tf_dot(a, a, weight))


def cg_solve_df32(
    a_vmult: Callable,
    b: TF,
    preconditioner: Callable | None = None,
    maxiter: int = 10000,
    abstol: float = 1e-20,
    reltol: float = 1e-4,
    force_iterations: int | None = None,
    weight: jax.Array | None = None,
) -> CGResult:
    """PCG with double-single outer vectors (deal.II ReductionControl
    semantics, identical to cg.cg_solve — multigrid_throughput.cc:1143-1145).

    ``a_vmult`` and ``preconditioner`` are plain f32 maps (the hybrid
    operator and the f32 V-cycle); x, r, p carry (hi, lo) pairs so the
    Krylov recursion holds ~53 mantissa bits — the NumberType=mixed
    boundary without any emulated f64 on the device.  ``weight`` is the
    optional ownership mask for sharded dots.  Returns CGResult with x as
    the TF pair (callers round or widen as needed)."""
    if preconditioner is None:
        preconditioner = lambda r: r

    x = tf_zeros_like(b.hi)
    r = TF(b.hi, b.lo)
    nrm2 = tf_dot(r, r, weight)
    norm0 = jnp.sqrt(nrm2)
    if force_iterations is not None:
        tol = jnp.asarray(0.0, jnp.float32)
        maxiter = force_iterations
    else:
        tol = jnp.maximum(jnp.asarray(abstol, jnp.float32), reltol * norm0)

    # deal.II SolverCG ordering (see cg.cg_solve): M applies at the START
    # of the body, after the convergence test — a converged solve does
    # exactly n_it V-cycles.  beta masked to 0 on the first iteration.

    def cond(state):
        x, r, p, rz, it, res = state
        return (res > tol) & (it < maxiter)

    def body(state):
        x, r, p, rz, it, res = state
        z = preconditioner(tf_round(r))
        rz_new = tf_dot_f32(r, z, weight)
        beta = jnp.where(it == 0, jnp.zeros_like(rz_new), rz_new / rz)
        p = tf_xpby(z, beta, p)
        ap = a_vmult(tf_round(p))
        alpha = rz_new / tf_dot_f32(p, ap, weight)
        x = tf_axpy(alpha, p, x)
        r = tf_axpy_f32(-alpha, ap, r)
        return (x, r, p, rz_new, it + 1, tf_norm(r, weight))

    state = (
        x, r, tf_zeros_like(b.hi), nrm2, jnp.asarray(0, jnp.int32), norm0
    )
    x, r, p, rz, it, res = jax.lax.while_loop(cond, body, state)
    return CGResult(x, it, res, res <= tol, norm0)


# --- host-loop variant (one jitted step per iteration) ---------------------
# Same algebra as cg_solve_df32, packaged for the axon while-loop-miscompile
# workaround used by the local-smoothing solves (see cg.cg_solve_host).

from functools import partial  # noqa: E402


@partial(jax.jit, static_argnames=("use_weight",))
def _df32_host_init(fop, b: TF, use_weight: bool):
    w = fop.owner if use_weight else None
    r = TF(b.hi, b.lo)
    nrm2 = tf_dot(r, r, w)
    return nrm2, jnp.sqrt(nrm2)


@partial(jax.jit, static_argnames=("use_weight",))
def _df32_host_step(fop, precond, x: TF, r: TF, p: TF, rz, it,
                    use_weight: bool):
    """One df32 PCG iteration (deal.II ordering — see cg._cg_host_step)."""
    w = fop.owner if use_weight else None
    z = precond.vmult(tf_round(r))
    rz_new = tf_dot_f32(r, z, w)
    beta = jnp.where(it == 0, jnp.zeros_like(rz_new), rz_new / rz)
    p = tf_xpby(z, beta, p)
    ap = fop.vmult(tf_round(p))
    alpha = rz_new / tf_dot_f32(p, ap, w)
    x = tf_axpy(alpha, p, x)
    r = tf_axpy_f32(-alpha, ap, r)
    return x, r, p, rz_new, tf_norm(r, w)


def _df32_masked_step(fop, precond, state, tol, maxiter, w):
    """One double-single PCG iteration frozen once converged (chain mode;
    deal.II ordering — see cg._pcg_masked_step for the masking contract)."""
    x, r, p, rz, it, res = state
    active = (res > tol) & (it < maxiter)
    z = precond.vmult(tf_round(r))
    rz2 = tf_dot_f32(r, z, w)
    beta = jnp.where(it == 0, jnp.zeros_like(rz2), rz2 / rz)
    p2 = tf_xpby(z, beta, p)
    ap = fop.vmult(tf_round(p2))
    alpha = rz2 / tf_dot_f32(p2, ap, w)
    x2 = tf_axpy(alpha, p2, x)
    r2 = tf_axpy_f32(-alpha, ap, r)
    res2 = tf_norm(r2, w)
    sel = lambda n, o: jax.tree.map(lambda a, c: jnp.where(active, a, c), n, o)
    return (
        sel(x2, x), sel(r2, r), sel(p2, p),
        jnp.where(active, rz2, rz),
        it + active.astype(it.dtype),
        jnp.where(active, res2, res),
    )


@partial(jax.jit, static_argnames=("k", "use_weight"))
def _df32_chain_first(fop, precond, b: TF, abstol, reltol, maxiter, k,
                      use_weight: bool):
    w = fop.owner if use_weight else None
    x = tf_zeros_like(b.hi)
    r = TF(b.hi, b.lo)
    nrm2 = tf_dot(r, r, w)
    norm0 = jnp.sqrt(nrm2)
    tol = jnp.maximum(
        jnp.asarray(abstol, jnp.float32),
        jnp.asarray(reltol, jnp.float32) * norm0,
    )
    state = (
        x, r, tf_zeros_like(b.hi), nrm2, jnp.asarray(0, jnp.int32), norm0
    )
    for _ in range(k):
        state = _df32_masked_step(fop, precond, state, tol, maxiter, w)
    return state, norm0, tol


@partial(jax.jit, static_argnames=("k", "use_weight"))
def _df32_chain_more(fop, precond, state, tol, maxiter, k, use_weight: bool):
    w = fop.owner if use_weight else None
    for _ in range(k):
        state = _df32_masked_step(fop, precond, state, tol, maxiter, w)
    return state


def cg_solve_chain_df32(
    fop,
    b: TF,
    preconditioner,
    maxiter: int = 10000,
    abstol: float = 1e-20,
    reltol: float = 1e-4,
    force_iterations: int | None = None,
    use_weight: bool = False,
    k0: int = 3,
) -> CGResult:
    """Double-single PCG as a host loop over CHUNKS of unrolled iterations
    (see cg.cg_solve_chain: the axon while_loop pays a ~170 ms fixed cost
    over the identical chain; the first k0 iterations are one dispatch)."""
    if force_iterations is not None:
        abstol_, reltol_, maxiter = 0.0, 0.0, force_iterations
    else:
        abstol_, reltol_ = abstol, reltol
    k0 = max(1, min(k0, max(maxiter, 1)))
    state, norm0, tol = _df32_chain_first(
        fop, preconditioner, b, abstol_, reltol_, maxiter, k0, use_weight
    )
    it, res, tol_f = jax.device_get((state[4], state[5], tol))
    it, res, tol_f = int(it), float(res), float(tol_f)
    while res > tol_f and it < maxiter:
        state = _df32_chain_more(
            fop, preconditioner, state, tol, maxiter, 1, use_weight
        )
        it, res = jax.device_get((state[4], state[5]))
        it, res = int(it), float(res)
    return CGResult(
        state[0],
        jnp.asarray(it, jnp.int32),
        jnp.asarray(res, jnp.float32),
        jnp.asarray(res <= tol_f),
        norm0,
    )


def cg_solve_host_df32(
    fop,
    b: TF,
    preconditioner,
    maxiter: int = 10000,
    abstol: float = 1e-20,
    reltol: float = 1e-4,
    force_iterations: int | None = None,
    use_weight: bool = False,
) -> CGResult:
    """Double-single PCG as a host loop (one jitted step per iteration),
    depth-1 pipelined like cg.cg_solve_host: the next step is dispatched on
    the current step's output futures before its residual scalar is
    fetched, hiding the axon tunnel round-trip."""
    rz0, norm0 = _df32_host_init(fop, b, use_weight)
    if force_iterations is not None:
        tol = 0.0
        maxiter = force_iterations
    else:
        tol = max(abstol, reltol * float(norm0))
    x = tf_zeros_like(b.hi)
    res = float(norm0)
    if res <= tol or maxiter <= 0:
        return CGResult(
            x, jnp.asarray(0, jnp.int32), jnp.asarray(res, jnp.float32),
            jnp.asarray(res <= tol), norm0,
        )
    it = 0
    step = _df32_host_step(
        fop, preconditioner, x, TF(b.hi, b.lo), tf_zeros_like(b.hi), rz0,
        0, use_weight,
    )
    x_cur = x
    while res > tol and it < maxiter:
        nxt = (
            _df32_host_step(
                fop, preconditioner, step[0], step[1], step[2], step[3],
                it + 1, use_weight,
            )
            if it + 1 < maxiter
            else None
        )
        res = float(step[4])
        x_cur = step[0]
        it += 1
        step = nxt
    return CGResult(
        x_cur,
        jnp.asarray(it, jnp.int32),
        jnp.asarray(res, jnp.float32),
        jnp.asarray(res <= tol),
        norm0,
    )
