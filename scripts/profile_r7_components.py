"""Component decomposition of the vmult at bench scale (r=7/p=4), L7 and L6.

Follows profile_r7.py: loop-in-jit timings of each vmult stage on the two
levels that carry 90% of the V-cycle (L7 188 ms, L6 68 ms of 279 ms).

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/profile_r7_components.py [r] [p]
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

    t0 = time.time()
    mesh = generators.create("quadrant", 3, r, 0)
    tri_seq = geometric_coarsening_sequence(mesh)
    plan = api.gc_level_plan("HMG-global", tri_seq, p)
    # only the two hot levels
    levels = {}
    for li in (len(plan) - 1, len(plan) - 2):
        m, d = plan[li]
        levels[li] = api.build_level_hybrid(m, d, jnp.float32)
    print(f"setup {time.time()-t0:.1f}s", flush=True)

    def stencil_only(o, v):
        return o.cell_apply_raw(v)

    def stencil_patch(o, v):
        # patch part of the stencil only
        up = o._patches(v)

        def ax(u, mat, axis):
            return jnp.moveaxis(
                jnp.tensordot(u, mat, axes=([axis], [1]),
                              precision=jax.lax.Precision.HIGHEST), -1, axis)

        KS, MS = o.KS, o.MS
        kx = ax(ax(ax(up, KS, 1), MS, 2), MS, 3)
        ky = ax(ax(ax(up, MS, 1), KS, 2), MS, 3)
        kz = ax(ax(ax(up, MS, 1), MS, 2), KS, 3)
        rp = (kx + ky + kz) * o.pscale[:, None, None, None]
        return o._with_patches(v, rp)

    def stencil_single(o, v):
        xs = o._singles(v)
        rs = jnp.matmul(xs, o.elem, precision=jax.lax.Precision.HIGHEST) \
            * o.sscale[:, None]
        return o._with_singles(v, rs)

    def irr_only(o, v):
        sums = [v[slots].sum(-1) for slots, _, _ in o.irr_buckets]
        for (slots, out_slots, out_group), s in zip(o.irr_buckets, sums):
            v = v.at[out_slots].set(s[out_group].astype(v.dtype))
        return v

    def cross_only(o, v):
        return o._exchange_cross(v) if o.use_cross else v

    comps = [
        ("vmult", lambda o, v: o.vmult(v)),
        ("stencil(all)", stencil_only),
        ("stencil(patch)", stencil_patch),
        ("stencil(single)", stencil_single),
        ("apply_c", lambda o, v: o.apply_c(v)),
        ("apply_ct_faces", lambda o, v: o.apply_ct_faces(v)),
        ("exchange", lambda o, v: o.exchange(v)),
        ("exch_cross", cross_only),
        ("exch_irr", irr_only),
        ("apply_ct", lambda o, v: o.apply_ct(v)),
    ]
    import dataclasses

    rng = np.random.default_rng(0)
    for li in sorted(levels, reverse=True):
        op = levels[li].op
        x = jnp.asarray(rng.standard_normal(op.n_slots), jnp.float32)
        print(f"--- L{li}: slots={op.n_slots} NP={op.NP} NS={op.NS} "
              f"use_cross={op.use_cross} use_ssweep={op.use_ssweep}", flush=True)
        variants = [
            ("base", op),
            ("tstencil", dataclasses.replace(op, use_tstencil=True)),
            ("rowsingle", dataclasses.replace(op, use_row_single=True)),
            ("both", dataclasses.replace(op, use_tstencil=True,
                                         use_row_single=True)),
            ("all_t", dataclasses.replace(op, use_tstencil=True,
                                          use_row_single=True,
                                          use_texchange=True)),
        ]
        for vname, vop in variants:
            t = timeit_looped(lambda o, v: o.vmult(v), vop, x)
            print(f"  vmult[{vname:9s}] {t*1e3:8.3f} ms", flush=True)
        for name, f in comps[1:]:
            t = timeit_looped(f, op, x)
            print(f"  {name:16s} {t*1e3:8.3f} ms", flush=True)

    # transfer variants on the same two levels
    from dealii_multigrid_tpu.ops.hybrid_transfer import make_hybrid_transfer

    lis = sorted(levels)
    lc, lf = levels[lis[0]], levels[lis[1]]
    tr = make_hybrid_transfer(lf.fmt, lc.fmt, lf.op, lc.op, jnp.float32)
    uc = jnp.asarray(rng.standard_normal(lc.op.n_slots), jnp.float32)
    rf = jnp.asarray(rng.standard_normal(lf.op.n_slots), jnp.float32)
    for name, t in (("base", tr),
                    ("ttransfer", dataclasses.replace(tr, use_ttransfer=True))):
        tt = timeit_looped(lambda o, v: o.restrict(v), t, rf)
        print(f"restrict[{name:9s}] {tt*1e3:8.3f} ms", flush=True)
        tt = timeit_looped(lambda o, v: o.prolong(v), t, uc)
        print(f"prolong [{name:9s}] {tt*1e3:8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
