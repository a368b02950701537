"""Minimal repro of the axon-XLA while-loop miscompilation (CLAUDE.md gotcha).

Observed: at quadrant r=6/p=4 the local-smoothing V-cycle inside a
lax.while_loop CG — or ANY >= 2-iteration chain in one jitted program —
produces inconsistent (x, r) loop state: the loop's recurrence residual and
the recomputed ||b - A x|| diverge by orders of magnitude, and the solver
reports hundreds of iterations instead of ~4.  Every single-application
program (one A(M(b)) composition per jit) is bit-exact against the CPU
backend.  Workaround in production: cg_solve_host / mg_solve(host_loop=True)
— one jitted PCG step per iteration (solvers/cg.py).

This script isolates the signature:
  1. run 2 PCG iterations as a host loop of single-step programs (ground
     truth granularity, verified bit-exact vs CPU elsewhere);
  2. run the same 2 iterations as ONE jitted program (unrolled, no
     while_loop — the failure reproduces with a plain chain);
  3. compare the resulting x and the recomputed residuals.

On a healthy backend the two agree to roundoff (CPU: ~1e-7 relative in f32).
On the axon backend at r>=6/p=4 mode (2) historically diverges.  Exit code 1
+ a MISCOMPILE line when the relative difference exceeds 1e-3.

Usage: python scripts/repro_while_miscompile.py [r] [p]   (default 6 4)
"""

import sys

import numpy as np


def main() -> int:
    r = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    p = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    import jax
    import jax.numpy as jnp

    from dealii_multigrid_tpu import api
    from dealii_multigrid_tpu.mesh import generators
    from dealii_multigrid_tpu.solvers.local_smoothing import (
        build_local_smoothing_mg_hybrid,
    )
    from dealii_multigrid_tpu.utils.params import MultigridParameters

    mesh = generators.create("quadrant", 3, r, 0)
    fine = api.build_level_hybrid(mesh, p, jnp.float32)
    mg_data = MultigridParameters()
    mg_data.smoother.degree = 3
    mg_data.coarse_solver.type = "amg"
    lsmg = build_local_smoothing_mg_hybrid(fine.dofh, fine.fmt, mg_data)
    keep = fine.op.constrained_keep

    rng = np.random.default_rng(0)
    b = jnp.asarray(
        fine.fmt.from_global(rng.standard_normal(fine.dofh.n_dofs)), jnp.float32
    )
    b = b * keep

    def precond(v):
        return lsmg.vmult(v) * keep

    def pcg_step(op, x, r_, p_, rz):
        ap = op.vmult(p_)
        alpha = (rz / op.dot(p_, ap)).astype(x.dtype)
        x = x + alpha * p_
        r_ = r_ - alpha * ap
        z = precond(r_)
        rz_new = op.dot(r_, z)
        beta = (rz_new / rz).astype(x.dtype)
        p_ = z + beta * p_
        return x, r_, p_, rz_new

    # mode 1: one jitted program PER STEP (the verified granularity)
    @jax.jit
    def init(op, b):
        z = precond(b)
        return z, op.dot(b, z)

    @jax.jit
    def step(op, x, r_, p_, rz):
        return pcg_step(op, x, r_, p_, rz)

    z0, rz0 = init(fine.op, b)
    x = jnp.zeros_like(b)
    r_ = b
    p_ = z0
    rz = rz0
    for _ in range(2):
        x, r_, p_, rz = step(fine.op, x, r_, p_, rz)
    x_host = np.asarray(x)

    # mode 2: the SAME two iterations in ONE program (unrolled chain)
    @jax.jit
    def two_steps(op, b):
        z = precond(b)
        x = jnp.zeros_like(b)
        r_ = b
        p_ = z
        rz = op.dot(b, z)
        for _ in range(2):
            x, r_, p_, rz = pcg_step(op, x, r_, p_, rz)
        return x, r_

    x2, r2 = two_steps(fine.op, b)
    x2_host = np.asarray(x2)

    # compare + recomputed residuals from a separate single-apply program
    @jax.jit
    def true_res(op, b, x):
        rr = b - op.vmult(x)
        return jnp.sqrt(op.dot(rr, rr))

    rel_x = float(
        np.linalg.norm(x2_host - x_host) / max(np.linalg.norm(x_host), 1e-30)
    )
    res1 = float(true_res(fine.op, b, x))
    res2 = float(true_res(fine.op, b, x2))
    loop_res2 = float(jnp.sqrt(fine.op.dot(r2, r2)))
    print(f"backend={jax.default_backend()} r={r} p={p}")
    print(f"per-step x vs one-program x: rel diff {rel_x:.3e}")
    print(f"true residual (per-step){res1:.6e}  (one-program) {res2:.6e}")
    print(f"one-program loop-state residual {loop_res2:.6e}")
    bad = rel_x > 1e-3 or abs(loop_res2 - res2) > 1e-2 * max(res2, 1e-30)
    if bad:
        print(
            "MISCOMPILE: multi-iteration program disagrees with the "
            "single-step granularity (the axon while-loop/chain signature)"
        )
        return 1
    print("OK: one-program chain matches per-step execution")
    return 0


if __name__ == "__main__":
    sys.exit(main())
