"""Decision probe for MGTPU_TSPLIT: full V-cycle and PCG-step A/B, flat-T
vs split-state pipeline, ONE build (the flat variant strips tv["split"]
from every level op before building its preconditioner, so both share
tables, eig memo, and session conditions).

Stage-level numbers (profile_tsplit) were mixed: L7 smoother -8%, L7
vmult +1%, L6 inverted — composition decides.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/probe_tsplit_vcycle.py [r] [p]
"""

import dataclasses
import os
import sys
import time

os.environ.setdefault("MGTPU_TV", "1")
os.environ.setdefault("MGTPU_TCFACES", "1")
os.environ.setdefault("MGTPU_TSPLIT", "1")

if os.environ.get("MGTPU_PLATFORM"):  # CPU smoke-testing
    import jax as _jax_platform_shim

    _jax_platform_shim.config.update(
        "jax_platforms", os.environ["MGTPU_PLATFORM"]
    )

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

    def strip(lv):
        op = lv.op
        if op.tv is None or "split" not in op.tv:
            return lv
        return dataclasses.replace(
            lv, op=dataclasses.replace(
                op, tv={k: v for k, v in op.tv.items() if k != "split"}
            )
        )

    levels_flat = [strip(lv) for lv in levels]
    fine = levels[-1]
    mg_data = MultigridParameters()
    mg_data.smoother.degree = 3
    mg_data.coarse_solver.type = "amg"
    pre_s = PreconditionMG(
        api.build_gc_preconditioner_hybrid(levels, mg_data, jnp.float32),
        jnp.float32,
    )
    pre_f = PreconditionMG(
        api.build_gc_preconditioner_hybrid(levels_flat, mg_data, jnp.float32),
        jnp.float32,
    )
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

    def vcycle(o, v):
        _fop, pre = o
        return pre.vmult(v)

    def full_step(o, v):
        fop, pre = o
        z = pre.vmult(v)
        ap = fop.vmult(z)
        return tail(ap, z)

    for name, f, o in (
        ("V[flat]", vcycle, (levels_flat[-1].op, pre_f)),
        ("V[split]", vcycle, (fine.op, pre_s)),
        ("step[flat]", full_step, (levels_flat[-1].op, pre_f)),
        ("step[split]", full_step, (fine.op, pre_s)),
    ):
        t, cs = timeit_looped(f, o, x)
        print(f"{name:12s} {t*1e3:9.3f} ms (compile {cs:.0f}s)", flush=True)
    # exactness: same V-cycle output
    a = np.asarray(pre_f.vmult(x))
    b = np.asarray(pre_s.vmult(x))
    rel = np.abs(a - b).max() / max(np.abs(a).max(), 1e-30)
    print(f"V split vs flat rel err: {rel:.2e}", flush=True)


if __name__ == "__main__":
    main()
