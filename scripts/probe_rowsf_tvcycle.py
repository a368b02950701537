"""Combined decision probe for MGTPU_ROWSF and MGTPU_TVCYCLE at bench
scale: full V-cycle (and the final PCG step) A/B across three
configurations from ONE build:

  base   — split pipeline only (production as of round-4h)
  rowsf  — + row-form singleton structured faces
  tvc    — + T-state level visits (one boundary transpose pair per visit)

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/probe_rowsf_tvcycle.py [r] [p]
"""

import dataclasses
import os
import sys
import time

os.environ.setdefault("MGTPU_TV", "1")
os.environ.setdefault("MGTPU_TCFACES", "1")
os.environ.setdefault("MGTPU_TSPLIT", "1")
os.environ.setdefault("MGTPU_ROWSF", "1")
os.environ.setdefault("MGTPU_TVCYCLE", "1")

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


def _strip_rowsf_op(op):
    tv = getattr(op, "tv", None)
    if tv is None or "split" not in tv:
        return op
    sp = tv["split"]
    if "rowsf_c" not in sp:
        return op
    return dataclasses.replace(
        op, tv={
            **tv,
            "split": {
                k: v for k, v in sp.items()
                if not k.startswith("rowsf") and k != "sfs_ro"
            },
        }
    )


def _strip_mg(mg):
    ops = tuple(_strip_rowsf_op(o) for o in mg.operators)
    sms = tuple(
        None if s is None else dataclasses.replace(s, op=_strip_rowsf_op(s.op))
        for s in mg.smoothers
    )
    trs = tuple(
        None if t is None
        else dataclasses.replace(t, coarse_op=_strip_rowsf_op(t.coarse_op))
        for t in mg.transfers
    )
    return dataclasses.replace(
        mg, operators=ops, smoothers=sms, transfers=trs, use_state=False
    )


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
    assert mg.use_state, "TVCYCLE did not engage at build"
    variants = [
        ("base ", _strip_mg(mg)),
        ("rowsf", dataclasses.replace(mg, use_state=False)),
        ("tvc  ", mg),
    ]
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
        mg_, fop = o
        return PreconditionMG(mg_, jnp.float32).vmult(v)

    def full_step(o, v):
        mg_, fop = o
        z = PreconditionMG(mg_, jnp.float32).vmult(v)
        ap = fop.vmult(z)
        return tail(ap, z)

    for name, m in variants:
        t, cs = timeit_looped(vcycle, (m, m.operators[-1]), x)
        print(f"V[{name}]    {t*1e3:9.3f} ms (compile {cs:.0f}s)", flush=True)
    for name, m in (variants[0], variants[2]):
        t, cs = timeit_looped(full_step, (m, m.operators[-1]), x)
        print(f"step[{name}] {t*1e3:9.3f} ms (compile {cs:.0f}s)", flush=True)
    # exactness: consistent input through the full V-cycle
    u = rng.standard_normal(fine.fmt.dofh.n_dofs).astype(np.float32)
    bc = jnp.asarray(fine.fmt.from_global(u).astype(np.float32))
    a = np.asarray(PreconditionMG(variants[0][1], jnp.float32).vmult(bc))
    for name, m in variants[1:]:
        c = np.asarray(PreconditionMG(m, jnp.float32).vmult(bc))
        rel = np.abs(a - c).max() / max(np.abs(a).max(), 1e-30)
        print(f"V[{name}] vs base rel err (consistent): {rel:.2e}", flush=True)


if __name__ == "__main__":
    main()
