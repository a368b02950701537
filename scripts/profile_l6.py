"""L6 vmult attribution at bench scale (r=7/p=4, KADAPT K=4: NP=512,
S=17, NS=7854, cross=True).  L6 measures 6.4-7.0 ms per apply for 3.5M
slots — 2.5x the per-slot cost of L7 — and contributes ~45 of the ~145 ms
V-cycle (6 applies + transfers).  This probe splits its tv pipeline
stages and isolates the cross-exchange core.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/profile_l6.py [r] [p]
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


def timeit_looped(f, o, v, n_loop=8, reps=2):
    def make(n):
        @jax.jit
        def run(o, v):
            out0 = f(o, v)

            def body(k, acc):
                s = jnp.asarray(jax.tree.leaves(acc)[0]).ravel()[0]
                vv = jax.tree.map(
                    lambda a: a * (1 + 1e-30 * s.astype(a.dtype)), v
                )
                return jax.tree.map(lambda a, b: a + b, acc, f(o, vv))

            return jax.lax.fori_loop(0, n, body, jax.tree.map(jnp.zeros_like, out0))

        return run

    r1, r2 = make(n_loop), make(2 * n_loop)
    r1(o, v), r2(o, v)
    t1 = min(_timed_call(r1, o, v) for _ in range(reps))
    t2 = min(_timed_call(r2, o, v) for _ in range(reps))
    return (t2 - t1) / n_loop


def main():
    r = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    p = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    from dealii_multigrid_tpu import api
    from dealii_multigrid_tpu.mesh import generators
    from dealii_multigrid_tpu.mesh.coarsening import geometric_coarsening_sequence

    t0 = time.time()
    mesh = generators.create("quadrant", 3, r, 0)
    plan = api.gc_level_plan("HMG-global", geometric_coarsening_sequence(mesh), p)
    ks = api.choose_level_ks(plan)
    li = len(plan) - 2
    m, d = plan[li]
    lv = api.build_level_hybrid(m, d, jnp.float32, K=ks[li])
    op = lv.op
    print(f"setup {time.time()-t0:.1f}s  L{li}: slots={op.n_slots} NP={op.NP} "
          f"NS={op.NS} S={op.S} K={ks[li]} cross={op.use_cross}", flush=True)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(op.n_slots), jnp.float32)
    xs = op._to_ts(x)
    no_cross = dataclasses.replace(op, use_cross=False)

    stages = [
        ("vmult (full)", lambda o, v: o.vmult(v), op, x),
        ("to_ts", lambda o, v: o._to_ts(v), op, x),
        ("from_ts", lambda o, v: o._from_ts(v), op, xs),
        ("apply_c_ts", lambda o, v: o._apply_c_ts(v), op, xs),
        ("stencil_ts", lambda o, v: o._cell_apply_raw_ts(v), op, xs),
        ("ct_faces_ts", lambda o, v: o._ct_faces_ts(v), op, xs),
        ("exchange_ts (cross)", lambda o, v: o._exchange_ts(v), op, xs),
        ("exchange_ts (sweeps only)", lambda o, v: o._exchange_ts(v),
         no_cross, xs),
        ("apply_ct_ts", lambda o, v: o._apply_ct_ts(v), op, xs),
    ]
    for name, f, o_, arg in stages:
        t = timeit_looped(f, o_, arg)
        print(f"  {name:26s} {t*1e3:8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
