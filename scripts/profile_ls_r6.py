"""LS (local smoothing) V-cycle attribution at r=6/p=4 — the VERDICT-r2
LS-vs-GC gap probe.

Builds the HMG-local hierarchy on the hybrid engine (api path), then
loop-in-jit times (DESIGN.md protocol — the axon tunnel adds ~35 ms per
dispatch, so never time a single call):

  * the full LS V-cycle application (PreconditionLS.vmult),
  * per-LEVEL smoother/operator applications,
  * the LS level transfers (prolong/restrict with interface masks),
  * the same pieces under each lane-dense variant flag combination
    (use_tstencil / use_row_single / use_texchange) — LS level meshes are
    uniform-level (patch-pure, NS ~ 0), so tstencil is the interesting one.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/profile_ls_r6.py [r] [p]
"""

import os

if os.environ.get("MGTPU_PLATFORM"):  # CPU smoke-testing (run_experiment contract)
    import jax as _jax_platform_shim

    _jax_platform_shim.config.update(
        "jax_platforms", os.environ["MGTPU_PLATFORM"]
    )


import dataclasses
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


def timeit_looped(f, o, v, n_loop=8, reps=2):
    def make(n):
        @jax.jit
        def run(o, v):
            out0 = f(o, v)

            def body(k, acc):
                s = acc.ravel()[0].astype(jnp.float32)
                vv = jax.tree.map(
                    lambda x: x * (1 + 1e-30 * s.astype(x.dtype)), v
                )
                return jax.tree.map(jnp.add, acc, f(o, vv))

            return jax.lax.fori_loop(0, n, body, out0)

        return run

    r1, r2 = make(n_loop), make(2 * n_loop)
    r1(o, v), r2(o, v)
    t1 = min(_timed_call(r1, o, v) for _ in range(reps))
    t2 = min(_timed_call(r2, o, v) for _ in range(reps))
    return (t2 - t1) / n_loop


def main():
    r = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    p = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    from dealii_multigrid_tpu import api
    from dealii_multigrid_tpu.mesh import generators
    from dealii_multigrid_tpu.solvers.local_smoothing import (
        build_local_smoothing_mg_hybrid,
    )
    from dealii_multigrid_tpu.utils.params import RunParameters

    params = RunParameters()
    params.type = "HMG-local"
    params.geometry_type = "quadrant"
    params.n_ref_global = r
    params.fe_degree_fine = p
    params.number_type = "float"
    params.mg_number_type = "float"
    params.mg_data.coarse_solver.type = "amg"
    params.mg_data.smoother.degree = 3

    t0 = time.time()
    mesh = generators.create("quadrant", 3, r, 0)
    fine = api.build_level_hybrid(mesh, p, jnp.float32)
    lsmg = build_local_smoothing_mg_hybrid(
        fine.dofh, fine.fmt, params.mg_data, dtype=jnp.float32
    )
    keep = fine.op.constrained_keep
    precond = api.PreconditionLS(lsmg, keep, jnp.float32)
    print(f"setup {time.time() - t0:.1f}s, {len(lsmg.levels)} LS levels",
          flush=True)

    rng = np.random.default_rng(0)
    b = jnp.asarray(rng.standard_normal(fine.op.n_slots), jnp.float32)

    t = timeit_looped(lambda o, v: o.vmult(v), precond, b)
    print(f"LS V-cycle [base      ] {t * 1e3:8.3f} ms", flush=True)

    # variant combinations on every level operator
    combos = [
        ("tstencil", dict(use_tstencil=True)),
        ("texchange", dict(use_texchange=True)),
        ("t+x", dict(use_tstencil=True, use_texchange=True)),
        ("t+x+row", dict(use_tstencil=True, use_texchange=True,
                         use_row_single=True)),
    ]
    for name, kw in combos:
        lv2 = tuple(
            dataclasses.replace(lv, op=dataclasses.replace(lv.op, **kw))
            for lv in lsmg.levels
        )
        sm2 = tuple(
            dataclasses.replace(sm, op=dataclasses.replace(sm.op, **kw))
            if sm is not None
            else None
            for sm in lsmg.smoothers
        )
        ls2 = dataclasses.replace(lsmg, levels=lv2, smoothers=sm2)
        p2 = api.PreconditionLS(ls2, keep, jnp.float32)
        t = timeit_looped(lambda o, v: o.vmult(v), p2, b)
        print(f"LS V-cycle [{name:10s}] {t * 1e3:8.3f} ms", flush=True)

    # per-level smoother + operator cost (base flags)
    for li, (lv, sm) in enumerate(zip(lsmg.levels, lsmg.smoothers)):
        x = jnp.asarray(
            rng.standard_normal(lv.op.n_slots), jnp.float32
        )
        tv = timeit_looped(lambda o, v: o.vmult(v), lv.op, x)
        ts = (
            timeit_looped(lambda o, v: o.vmult(v), sm, x)
            if sm is not None
            else float("nan")
        )
        print(
            f"  L{li}: slots={lv.op.n_slots:9d} NP={lv.op.NP:6d} "
            f"NS={lv.op.NS:6d} vmult {tv * 1e3:7.3f} ms "
            f"smoother {ts * 1e3:7.3f} ms",
            flush=True,
        )


if __name__ == "__main__":
    main()
