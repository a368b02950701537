"""Minimal bench-scale (r=7/p=4) V-cycle attribution probe.

profile_vmult.py measures ~30 loop-in-jit programs — at r=7 each costs the
axon remote compiler 25-450 s, so this trimmed probe times ONLY the
components that decide the next structural lever: per-level vmult, the full
V-cycle, fine transfers and the fine smoother.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/profile_r7.py [r] [p]
"""

import os

if os.environ.get("MGTPU_PLATFORM"):  # CPU smoke-testing (run_experiment contract)
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
    float(jnp.asarray(jax.tree.leaves(r)[0]).ravel()[0])  # true fence (axon)
    return time.perf_counter() - t0


def timeit_looped(f, o, v, n_loop=8, reps=2):
    def make(n):
        @jax.jit
        def run(o, v):
            out0 = f(o, v)

            def body(k, acc):
                s = acc.ravel()[0].astype(jnp.float32)
                vv = v * (1 + 1e-30 * s.astype(v.dtype))
                return acc + f(o, vv)

            return jax.lax.fori_loop(0, n, body, jnp.zeros_like(out0))

        return run

    r1, r2 = make(n_loop), make(2 * n_loop)
    t0 = time.time()
    r1(o, v), r2(o, v)  # compile
    compile_s = time.time() - t0
    t1 = min(_timed_call(r1, o, v) for _ in range(reps))
    t2 = min(_timed_call(r2, o, v) for _ in range(reps))
    return (t2 - t1) / n_loop, compile_s


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
    tri_seq = geometric_coarsening_sequence(mesh)
    plan = api.gc_level_plan("HMG-global", tri_seq, p)
    ks = api.choose_level_ks(plan)  # honors MGTPU_KADAPT
    levels = [
        api.build_level_hybrid(m, d, jnp.float32, K=k)
        for (m, d), k in zip(plan, ks)
    ]
    print(f"level Ks: {ks}", flush=True)
    fine = levels[-1]
    print(f"setup {time.time()-t0:.1f}s  levels={len(levels)} "
          f"n_dofs={fine.dofh.n_dofs} n_slots={fine.op.n_slots}", flush=True)

    rng = np.random.default_rng(0)

    # per-level vmult, finest first (most informative if the run is cut short)
    for li in range(len(levels) - 1, max(len(levels) - 5, 0) - 1, -1):
        lv = levels[li]
        xl = jnp.asarray(rng.standard_normal(lv.op.n_slots), jnp.float32)
        t, cs = timeit_looped(lambda o, v: o.vmult(v), lv.op, xl)
        print(f"L{li} vmult {t*1e3:9.3f} ms   slots={lv.op.n_slots} "
              f"NP={lv.op.NP} NS={lv.op.NS} (compile {cs:.0f}s)", flush=True)

    mg_data = MultigridParameters()
    mg_data.smoother.degree = 3
    mg_data.coarse_solver.type = "amg"
    mg = api.build_gc_preconditioner_hybrid(levels, mg_data, jnp.float32)
    precond = PreconditionMG(mg, jnp.float32)

    x = jnp.asarray(rng.standard_normal(fine.op.n_slots), jnp.float32)
    t, cs = timeit_looped(lambda s, v: s.vmult(v), mg.smoothers[-1], x, n_loop=4)
    print(f"smoother L{len(levels)-1} (deg 3) {t*1e3:9.3f} ms (compile {cs:.0f}s)",
          flush=True)

    tr = mg.transfers[-1]
    t, cs = timeit_looped(lambda tt, v: tt.restrict(v), tr, x, n_loop=4)
    print(f"restrict fine {t*1e3:9.3f} ms (compile {cs:.0f}s)", flush=True)
    xc = jnp.asarray(rng.standard_normal(levels[-2].op.n_slots), jnp.float32)
    t, cs = timeit_looped(lambda tt, v: tt.prolong(v), tr, xc, n_loop=4)
    print(f"prolong fine  {t*1e3:9.3f} ms (compile {cs:.0f}s)", flush=True)

    t, cs = timeit_looped(lambda m, v: m.vmult(v), precond, x, n_loop=2)
    print(f"V-cycle       {t*1e3:9.3f} ms (compile {cs:.0f}s)", flush=True)

    # one full outer PCG iteration (A apply + V-cycle + dots/axpys) — the
    # unit the bench pays per iteration; closes the attribution gap between
    # the V-cycle row and bench solve_time/n_iterations
    def cg_step(o, v):
        fop, pre = o
        r, p = v, v
        rz = jnp.sum(r * r)
        ap = fop.vmult(p)
        alpha = (rz / jnp.sum(p * ap)).astype(v.dtype)
        xn = alpha * p
        r = r - alpha * ap
        z = pre.vmult(r)
        rz2 = jnp.sum(r * z)
        beta = (rz2 / rz).astype(v.dtype)
        return xn + z + beta * p + jnp.sqrt(rz2) * 1e-30

    t, cs = timeit_looped(cg_step, (fine.op, precond), x, n_loop=2)
    print(f"PCG step f32  {t*1e3:9.3f} ms (compile {cs:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
