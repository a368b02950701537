"""TV-mode (transposed-vmult) probe at bench scale: vmult + per-stage
timings for base / all-variant / tv on the two hot levels of r=7/p=4,
plus a V-cycle comparison via profile_r7's protocol.

Builds ONE set of levels with MGTPU_TV=1 (plus the production variant
flags); the baseline and all_t operators are the same build with
replace(tv=None, ...) so the comparison is apples-to-apples.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/profile_tv.py [r] [p]
"""

import dataclasses
import os
import sys
import time

os.environ.setdefault("MGTPU_TV", "1")
os.environ.setdefault("MGTPU_TGEMM", "1")  # stage eye; both paths timed
os.environ.setdefault("MGTPU_TCFACES", "1")  # stage dense faces; both timed

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
    # "lite": fine level only, production variants only (~7 programs instead
    # of ~32 — each costs the remote compiler 25-450 s on a cold cache)
    lite = len(sys.argv) > 3 and sys.argv[3] == "lite"

    from dealii_multigrid_tpu import api
    from dealii_multigrid_tpu.mesh import generators
    from dealii_multigrid_tpu.mesh.coarsening import geometric_coarsening_sequence

    t0 = time.time()
    mesh = generators.create("quadrant", 3, r, 0)
    tri_seq = geometric_coarsening_sequence(mesh)
    plan = api.gc_level_plan("HMG-global", tri_seq, p)
    ks = api.choose_level_ks(plan)  # honors MGTPU_KADAPT
    levels = {}
    lis = (len(plan) - 1,) if lite else (len(plan) - 1, len(plan) - 2)
    for li in lis:
        m, d = plan[li]
        levels[li] = api.build_level_hybrid(m, d, jnp.float32, K=ks[li])
    print(f"setup {time.time()-t0:.1f}s", flush=True)

    rng = np.random.default_rng(0)
    for li in sorted(levels, reverse=True):
        op = levels[li].op
        assert op.tv is not None, f"L{li}: tv tables missing"
        x = jnp.asarray(rng.standard_normal(op.n_slots), jnp.float32)
        print(
            f"--- L{li}: slots={op.n_slots} NP={op.NP} NS={op.NS} "
            f"cross={op.use_cross} c_rounds={op.sf_c_rounds} "
            f"ct_rounds={op.sf_ct_rounds}",
            flush=True,
        )
        base = dataclasses.replace(
            op, tv=None, use_tstencil=False, use_row_single=False,
            use_texchange=False,
        )
        all_t = dataclasses.replace(op, tv=None)
        plain = dataclasses.replace(
            op, tv={
                k: v
                for k, v in op.tv.items()
                if k not in ("eye", "sfp_dense")
            }
        )
        tcf = dataclasses.replace(
            op, tv={k: v for k, v in op.tv.items() if k != "eye"}
        )
        tge = dataclasses.replace(
            op, tv={k: v for k, v in op.tv.items() if k != "sfp_dense"}
        )
        variants = [
            ("base+rounds", base), ("all_t+rounds", all_t),
            ("tv", plain), ("tv+tgemm", tge), ("tv+tcfaces", tcf),
        ]
        if lite:
            variants = [("tv+tcfaces", tcf)]
        for vname, vop in variants:
            t = timeit_looped(lambda o, v: o.vmult(v), vop, x)
            print(f"  vmult[{vname:12s}] {t*1e3:8.3f} ms", flush=True)
        # tv stage decomposition (operator variant passed as the jit ARG —
        # a closure capture would bake the volume tables as HLO constants)
        xt = op._to_t(x)
        stages = [
            ("to_t", lambda o, v: o._to_t(v), plain, x),
            ("to_t[gemm]", lambda o, v: o._to_t(v), tge, x),
            ("from_t[gemm]", lambda o, v: o._from_t(v), tge, xt),
            ("apply_c_t", lambda o, v: o._apply_c_t(v), plain, xt),
            ("apply_c_t[dense]", lambda o, v: o._apply_c_t(v), tcf, xt),
            ("stencil_t", lambda o, v: o._cell_apply_raw_t(v), plain, xt),
            ("ct_faces_t", lambda o, v: o._ct_faces_t(v), plain, xt),
            ("ct_faces_t[dense]", lambda o, v: o._ct_faces_t(v), tcf, xt),
            ("exchange_t", lambda o, v: o._exchange_t(v), plain, xt),
            ("apply_ct_t", lambda o, v: o._apply_ct_t(v), plain, xt),
            ("from_t", lambda o, v: o._from_t(v), plain, xt),
        ]
        if lite:
            stages = [
                ("to_t", lambda o, v: o._to_t(v), tcf, x),
                ("apply_c_t[dense]", lambda o, v: o._apply_c_t(v), tcf, xt),
                ("stencil_t", lambda o, v: o._cell_apply_raw_t(v), tcf, xt),
                ("ct_faces_t[dense]", lambda o, v: o._ct_faces_t(v), tcf, xt),
                ("exchange_t", lambda o, v: o._exchange_t(v), tcf, xt),
                ("apply_ct_t", lambda o, v: o._apply_ct_t(v), tcf, xt),
                ("from_t", lambda o, v: o._from_t(v), tcf, xt),
            ]
        for name, f, o_, arg in stages:
            t = timeit_looped(f, o_, arg)
            print(f"  {name:14s} {t*1e3:8.3f} ms", flush=True)
        # exactness spot-check on-device.  MUST use a slot-CONSISTENT input
        # (all slots of a dof equal): apply_c's scatter-set relies on
        # duplicate face targets receiving equal values, so on inconsistent
        # vectors the winner is legitimately backend/program-dependent (a
        # raw randn vector showed a spurious 2.3e-3 'error' here).
        if lite:
            continue
        fmt = levels[li].fmt
        u = rng.standard_normal(fmt.dofh.n_dofs).astype(np.float32)
        xc = jnp.asarray(fmt.from_global(u).astype(np.float32))
        a = np.asarray(all_t.vmult(xc))
        b = np.asarray(op.vmult(xc))
        rel = np.abs(a - b).max() / max(np.abs(a).max(), 1e-30)
        print(f"  tv vs all_t rel err (consistent input): {rel:.2e}", flush=True)


if __name__ == "__main__":
    main()
