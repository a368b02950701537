"""Row-form singleton structured faces (MGTPU_ROWSF) A/B at bench scale:
L7 and L6 vmult + smoother step, split-with-rowsf vs split-with-element-
tables, ONE build (the baseline strips the rowsf keys from tv["split"]).

profile_l6 priced the element tables at 1.83 (apply_c) + 1.93 (ct_faces)
ms of the 6.9 ms L6 vmult; the same tables recur at L7.  Block rows cost
~4 ns/row vs ~7.7 ns/element.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/profile_rowsf.py [r] [p]
"""

import dataclasses
import os
import sys
import time

os.environ.setdefault("MGTPU_TV", "1")
os.environ.setdefault("MGTPU_TCFACES", "1")
os.environ.setdefault("MGTPU_TSPLIT", "1")
os.environ.setdefault("MGTPU_ROWSF", "1")

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
                s = acc.ravel()[0].astype(jnp.float32)
                vv = v * (1 + 1e-30 * s.astype(v.dtype))
                return acc + f(o, vv)

            return jax.lax.fori_loop(0, n, body, jnp.zeros_like(out0))

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
    from dealii_multigrid_tpu.solvers.chebyshev import ChebyshevSmoother

    t0 = time.time()
    mesh = generators.create("quadrant", 3, r, 0)
    plan = api.gc_level_plan("HMG-global", geometric_coarsening_sequence(mesh), p)
    ks = api.choose_level_ks(plan)
    levels = {}
    for li in (len(plan) - 1, len(plan) - 2):
        m, d = plan[li]
        levels[li] = api.build_level_hybrid(m, d, jnp.float32, K=ks[li])
    print(f"setup {time.time()-t0:.1f}s", flush=True)

    rng = np.random.default_rng(0)
    for li in sorted(levels, reverse=True):
        lv = levels[li]
        op = lv.op
        sp = op.tv.get("split", {}) if op.tv else {}
        if "rowsf_c" not in sp:
            print(f"--- L{li}: no rowsf tables (skipped)", flush=True)
            continue
        base = dataclasses.replace(
            op, tv={
                **op.tv,
                "split": {
                    k: v for k, v in sp.items()
                    if not k.startswith("rowsf") and k != "sfs_ro"
                },
            }
        )
        x = jnp.asarray(rng.standard_normal(op.n_slots), jnp.float32)
        print(
            f"--- L{li}: slots={op.n_slots} NP={op.NP} NS={op.NS} "
            f"S={op.S} cross={op.use_cross}", flush=True,
        )
        for name, vop in (("elem ", base), ("rowsf", op)):
            t = timeit_looped(lambda o, v: o.vmult(v), vop, x)
            print(f"  vmult[{name}]    {t*1e3:8.3f} ms", flush=True)
        sm_r = ChebyshevSmoother.create(op, lv.inv_diag, degree=3,
                                        max_eigenvalue=2.0)
        sm_e = ChebyshevSmoother.create(base, lv.inv_diag, degree=3,
                                        max_eigenvalue=2.0)
        for name, sm in (("elem ", sm_e), ("rowsf", sm_r)):
            t = timeit_looped(lambda o, v: o.vmult(v), sm, x)
            print(f"  smoother[{name}] {t*1e3:8.3f} ms", flush=True)
        # exactness on slot-consistent input
        u = rng.standard_normal(lv.fmt.dofh.n_dofs).astype(np.float32)
        xc = jnp.asarray(lv.fmt.from_global(u).astype(np.float32))
        a = np.asarray(base.vmult(xc))
        b = np.asarray(op.vmult(xc))
        rel = np.abs(a - b).max() / max(np.abs(a).max(), 1e-30)
        print(f"  rowsf vs elem rel err (consistent input): {rel:.2e}",
              flush=True)


if __name__ == "__main__":
    main()
