"""Bisect the PCG-step in-context overhead (round-4e: V-cycle 145.4 ms,
A.p 15.5 ms, full PCG step 198.8 ms — a ~38 ms residue that standalone
vector ops (microbench_vecops: cg tail 0.65 ms) cannot explain).

Times three compositions with the loop-in-jit protocol:
  V+A        precond.vmult then fop.vmult         (expect ~161 if additive)
  V+tail     precond.vmult then the CG vector tail (expect ~146)
  V+A+tail   the full PCG-step shape               (the 198.8 reference)

Whichever composition jumps tells us whether the residue is the
V-and-A pairing (operator-table buffer pressure), the tail's placement,
or a superlinear program-size effect.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/probe_pcg_context.py [r] [p]
"""

import os

if os.environ.get("MGTPU_PLATFORM"):  # CPU smoke-testing
    import jax as _jax_platform_shim

    _jax_platform_shim.config.update(
        "jax_platforms", os.environ["MGTPU_PLATFORM"]
    )

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def _timed_call(run, *args):
    t0 = time.perf_counter()
    r = run(*args)
    float(jnp.asarray(jax.tree.leaves(r)[0]).ravel()[0])
    return time.perf_counter() - t0


def timeit_looped(f, o, v, n_loop=2, reps=3):
    def make(n):
        @jax.jit
        def run(o, v):
            out0 = f(o, v)

            def body(k, acc):
                s = acc.ravel()[0].astype(jnp.float32)
                vv = v * (1 + 1e-30 * s.astype(v.dtype))
                return acc + f(o, vv)

            return jax.lax.fori_loop(0, n, body, out0)

        return run

    r1, r2 = make(n_loop), make(2 * n_loop)
    t0 = time.time()
    r1(o, v), r2(o, v)
    cs = time.time() - t0
    t1 = min(_timed_call(r1, o, v) for _ in range(reps))
    t2 = min(_timed_call(r2, o, v) for _ in range(reps))
    return (t2 - t1) / n_loop, cs


def main():
    r = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    p = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    from dealii_multigrid_tpu import api
    from dealii_multigrid_tpu.mesh import generators
    from dealii_multigrid_tpu.mesh.coarsening import geometric_coarsening_sequence
    from dealii_multigrid_tpu.solvers.multigrid import PreconditionMG
    from dealii_multigrid_tpu.utils.params import MultigridParameters

    t0 = time.time()
    mesh = generators.create("quadrant", 3, r, 0)
    plan = api.gc_level_plan("HMG-global", geometric_coarsening_sequence(mesh), p)
    ks = api.choose_level_ks(plan)
    levels = [
        api.build_level_hybrid(m, d, jnp.float32, K=kk)
        for (m, d), kk in zip(plan, ks)
    ]
    fine = levels[-1]
    mg_data = MultigridParameters()
    mg_data.smoother.degree = 3
    mg_data.coarse_solver.type = "amg"
    mg = api.build_gc_preconditioner_hybrid(levels, mg_data, jnp.float32)
    precond = PreconditionMG(mg, jnp.float32)
    print(f"setup {time.time()-t0:.1f}s", flush=True)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(fine.op.n_slots), jnp.float32)

    def tail(r_, z):
        rz = jnp.sum(r_ * z)
        beta = (rz / (rz + 1.0)).astype(r_.dtype)
        pp = z + beta * r_
        pap = jnp.sum(pp * z)
        alpha = (rz / pap).astype(r_.dtype)
        return alpha * pp + r_ - alpha * z + jnp.sqrt(jnp.abs(pap)) * 1e-30

    def v_plus_a(o, v):
        fop, pre = o
        z = pre.vmult(v)
        return fop.vmult(z)

    def v_plus_tail(o, v):
        fop, pre = o
        z = pre.vmult(v)
        return tail(v, z)

    def full_step(o, v):
        fop, pre = o
        z = pre.vmult(v)
        ap = fop.vmult(z)
        return tail(ap, z)

    for name, f in (("V+A", v_plus_a), ("V+tail", v_plus_tail),
                    ("V+A+tail", full_step)):
        t, cs = timeit_looped(f, (fine.op, precond), x)
        print(f"{name:9s} {t*1e3:9.3f} ms (compile {cs:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
