"""Isolate the outer-CG loop-construct overhead at bench scale.

Round-4b measured the monolithic lax.while_loop PCG at ~231 ms/iteration
where the SAME algebra as a standalone jitted step program costs ~185 ms
(RESULTS.md).  This probe times the identical PCG body under three loop
constructs inside one jit — unrolled chain, lax.fori_loop, and
lax.while_loop with the production data-dependent cond — at k and 2k
trip counts, so (t(2k) - t(k)) / k gives the per-iteration cost of each
construct with dispatch excluded.  Whichever construct matches the chain
tells us whether the tax is the dynamic trip count (cond), the loop-
carried state, or neither (i.e. the earlier session-variance).

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/probe_cg_loop.py [r] [p]
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


def _fence(r):
    float(jnp.asarray(jax.tree.leaves(r)[0]).ravel()[0])


def _timed(run, *args):
    t0 = time.perf_counter()
    _fence(run(*args))
    return time.perf_counter() - t0


def main():
    r = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    p = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    kinds = (sys.argv[4].split(",") if len(sys.argv) > 4
             else ["chain", "while", "fori"])

    from dealii_multigrid_tpu import api
    from dealii_multigrid_tpu.mesh import generators
    from dealii_multigrid_tpu.mesh.coarsening import geometric_coarsening_sequence
    from dealii_multigrid_tpu.solvers.multigrid import PreconditionMG
    from dealii_multigrid_tpu.utils.params import MultigridParameters

    t0 = time.time()
    mesh = generators.create("quadrant", 3, r, 0)
    tri_seq = geometric_coarsening_sequence(mesh)
    plan = api.gc_level_plan("HMG-global", tri_seq, p)
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
    print(f"setup {time.time()-t0:.1f}s  n_dofs={fine.dofh.n_dofs}", flush=True)

    rng = np.random.default_rng(0)
    b = jnp.asarray(rng.standard_normal(fine.op.n_slots), jnp.float32)

    def init(fop, pre, b):
        x = jnp.zeros_like(b)
        r = b
        z = pre.vmult(r)
        rz = jnp.sum(r * z)
        return (x, r, z, z, rz, jnp.asarray(0, jnp.int32),
                jnp.sqrt(jnp.sum(r * r)))

    def body(fop, pre, state):
        x, r, z, pp, rz, it, res = state
        ap = fop.vmult(pp)
        alpha = (rz / jnp.sum(pp * ap)).astype(x.dtype)
        x = x + alpha * pp
        r = r - alpha * ap
        z = pre.vmult(r)
        rz_new = jnp.sum(r * z)
        beta = (rz_new / rz).astype(x.dtype)
        pp = z + beta * pp
        return (x, r, z, pp, rz_new, it + 1, jnp.sqrt(jnp.sum(r * r)))

    def make(kind, n):
        @jax.jit
        def run(fop, pre, b):
            state = init(fop, pre, b)
            if kind == "chain":
                for _ in range(n):
                    state = body(fop, pre, state)
            elif kind == "fori":
                state = jax.lax.fori_loop(
                    0, n, lambda i, s: body(fop, pre, s), state
                )
            elif kind == "while":
                state = jax.lax.while_loop(
                    lambda s: (s[6] > 0.0) & (s[5] < n),
                    lambda s: body(fop, pre, s),
                    state,
                )
            return state[0], state[6]

        return run

    for kind in kinds:
        r1, r2 = make(kind, k), make(kind, 2 * k)
        tc0 = time.time()
        _fence(r1(fine.op, precond, b))
        _fence(r2(fine.op, precond, b))
        compile_s = time.time() - tc0
        t1 = min(_timed(r1, fine.op, precond, b) for _ in range(3))
        t2 = min(_timed(r2, fine.op, precond, b) for _ in range(3))
        print(
            f"{kind:6s} t({k})={t1*1e3:8.1f} ms  t({2*k})={t2*1e3:8.1f} ms  "
            f"per-it {(t2-t1)/k*1e3:8.1f} ms  (compile {compile_s:.0f}s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
