"""Measure the per-component cost of the hybrid vmult + V-cycle on the TPU.

The axon tunnel adds ~35 ms of dispatch+fetch latency to EVERY jitted call
(measured: a 125-slot vmult and a 400k-row gather both take ~35 ms wall).
So every timing here loops the component N times INSIDE one jit (with a
tiny scalar data dependency to stop XLA hoisting loop-invariant work) and
reports (t(2N) - t(N)) / N — the pure per-application device time.

Usage: python scripts/profile_vmult.py [r] [p]
"""

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


def timeit_looped(f, o, v, n_loop=16, reps=3):
    """Per-application seconds of v -> f(o, v), loop-in-jit, overhead-free."""

    def make(n):
        @jax.jit
        def run(o, v):
            out0 = f(o, v)
            is_int = jnp.issubdtype(v.dtype, jnp.integer)

            def body(k, acc):
                s = acc.ravel()[0].astype(jnp.float32)
                if is_int:
                    # integer operand (gather indices): add a data-dependent 0
                    vv = v + jnp.isnan(s).astype(v.dtype)
                else:
                    vv = v * (1 + 1e-30 * s.astype(v.dtype))
                return acc + f(o, vv)

            return jax.lax.fori_loop(0, n, body, jnp.zeros_like(out0))

        return run

    r1, r2 = make(n_loop), make(2 * n_loop)
    r1(o, v), r2(o, v)  # compile
    t1 = min(_timed_call(r1, o, v) for _ in range(reps))
    t2 = min(_timed_call(r2, o, v) for _ in range(reps))
    return (t2 - t1) / n_loop


def main():
    r = int(sys.argv[1]) if len(sys.argv) > 1 else 6
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
    levels = [api.build_level_hybrid(m, d, jnp.float32) for m, d in plan]
    fine = levels[-1]
    op = fine.op
    print(f"setup {time.time()-t0:.1f}s  levels={len(levels)}  "
          f"n_dofs={fine.dofh.n_dofs}  n_slots={op.n_slots}  "
          f"NP={op.NP} NS={op.NS} S={op.S}")
    n_irr = sum(int(b[1].shape[0]) for b in op.irr_buckets)
    n_irr_rows = sum(int(b[0].shape[0]) for b in op.irr_buckets)
    print(f"irr groups={n_irr_rows} irr out slots={n_irr} "
          f"sf levels={len(op.sf_levels)} "
          f"slave rows={int(op.slave_rep.shape[0])} ct={int(op.ct_target.shape[0])}")

    x = jnp.asarray(np.random.default_rng(0).standard_normal(op.n_slots), jnp.float32)

    def irr_only(o, v):
        sums = [v[slots].sum(-1) for slots, _, _ in o.irr_buckets]
        for (slots, out_slots, out_group), s in zip(o.irr_buckets, sums):
            v = v.at[out_slots].set(s[out_group].astype(v.dtype))
        return v

    def psweep_only(o, v):
        if not o.NP:
            return v
        import dealii_multigrid_tpu.ops.hybrid as hy

        up = o._patches(v)
        for d in range(3):
            axis = d + 1
            lo_n, hi_n = o.nbr[2 * d], o.nbr[2 * d + 1]
            lo_m, hi_m = o.nbr_mask[2 * d], o.nbr_mask[2 * d + 1]
            sl_top = [slice(None)] * 4
            sl_top[axis] = o.S - 1
            sl_bot = [slice(None)] * 4
            sl_bot[axis] = 0
            bshape = (-1,) + (1,) * 2
            top = up[tuple(sl_top)]
            bot = up[tuple(sl_bot)]
            up = up.at[tuple(sl_bot)].add(top[lo_n] * lo_m.reshape(bshape))
            up = up.at[tuple(sl_top)].add(bot[hi_n] * hi_m.reshape(bshape))
        return o._with_patches(v, up)

    def ssweep_only(o, v):
        if not (o.NS and o.use_ssweep):
            return v
        n1 = o._n1
        us = o._singles(v).reshape(o.NS, n1, n1, n1)
        for d in range(3):
            axis = d + 1
            lo_n, hi_n = o.snbr[2 * d], o.snbr[2 * d + 1]
            lo_m, hi_m = o.snbr_mask[2 * d], o.snbr_mask[2 * d + 1]
            sl_top = [slice(None)] * 4
            sl_top[axis] = n1 - 1
            sl_bot = [slice(None)] * 4
            sl_bot[axis] = 0
            bshape = (-1,) + (1,) * 2
            top = us[tuple(sl_top)]
            bot = us[tuple(sl_bot)]
            us = us.at[tuple(sl_bot)].add(top[lo_n] * lo_m.reshape(bshape))
            us = us.at[tuple(sl_top)].add(bot[hi_n] * hi_m.reshape(bshape))
        return o._with_singles(v, us)

    def _sf_part(o, v, which):
        """apply_c with only the patch ('p') or singleton ('s') face tables."""
        import jax.numpy as jnp
        from jax.lax import Precision

        HIGHEST = Precision.HIGHEST
        E1 = o.sf_E1.astype(v.dtype)
        x = v
        for i, _lev in enumerate(o.sf_levels):
            idxs, vals_ = [], []
            if which == "p" and o.sf_patch[i] is not None:
                face, src, _m = o.sf_patch[i]
                sv = x[src]
                plane = jnp.einsum(
                    "nsj,is->nij",
                    jnp.einsum("nst,jt->nsj", sv, E1, precision=HIGHEST),
                    E1, precision=HIGHEST,
                )
                idxs.append(face.reshape(-1))
                vals_.append(plane.reshape(-1))
            if which == "s" and o.sf_single[i] is not None:
                face, src, _m, pa, pb = o.sf_single[i]
                Ea = o.sf_Eh[pa].astype(x.dtype)
                Eb = o.sf_Eh[pb].astype(x.dtype)
                sv = x[src]
                tmp = jnp.einsum("nmk,njk->nmj", sv, Eb, precision=HIGHEST)
                plane = jnp.einsum("nmj,nim->nij", tmp, Ea, precision=HIGHEST)
                idxs.append(face.reshape(-1))
                vals_.append(plane.reshape(-1))
            if idxs:
                x = x.at[jnp.concatenate(idxs)].set(jnp.concatenate(vals_))
        return x

    comps = [
        ("vmult", lambda o, v: o.vmult(v)),
        ("cell_apply_raw", lambda o, v: o.cell_apply_raw(v)),
        ("apply_c", lambda o, v: o.apply_c(v)),
        ("  c_sf_patch", lambda o, v: _sf_part(o, v, "p")),
        ("  c_sf_single", lambda o, v: _sf_part(o, v, "s")),
        ("apply_ct_faces", lambda o, v: o.apply_ct_faces(v)),
        ("exchange", lambda o, v: o.exchange(v)),
        ("  psweep_only", psweep_only),
        ("  ssweep_only", ssweep_only),
        ("  irr_only", irr_only),
        ("apply_ct", lambda o, v: o.apply_ct(v)),
    ]
    for name, f in comps:
        t = timeit_looped(f, op, x)
        print(f"{name:16s} {t*1e3:8.3f} ms   {fine.dofh.n_dofs/t/1e6:8.1f} MDoF/s")

    mg_data = MultigridParameters()
    mg_data.smoother.degree = 3
    mg_data.coarse_solver.type = "amg"
    mg = api.build_gc_preconditioner_hybrid(levels, mg_data, jnp.float32)
    precond = PreconditionMG(mg, jnp.float32)
    t = timeit_looped(lambda m, v: m.vmult(v), precond, x, n_loop=4)
    print(f"{'V-cycle':16s} {t*1e3:8.3f} ms")
    for l, lv in enumerate(levels):
        xl = jnp.asarray(
            np.random.default_rng(l).standard_normal(lv.op.n_slots), jnp.float32
        )
        t = timeit_looped(lambda o, v: o.vmult(v), lv.op, xl)
        n_irr_l = sum(int(b[1].shape[0]) for b in lv.op.irr_buckets)
        print(f"  level {l} vmult  {t*1e3:8.3f} ms   n_slots={lv.op.n_slots} "
              f"NP={lv.op.NP} NS={lv.op.NS} irr={n_irr_l} ssweep={lv.op.use_ssweep}")
        if lv.op.n_slots > 100_000:
            for nm, ff in (("stencil", lambda o, v: o.cell_apply_raw(v)),
                           ("apply_c", lambda o, v: o.apply_c(v)),
                           ("ct_faces", lambda o, v: o.apply_ct_faces(v)),
                           ("exch", lambda o, v: o.exchange(v)),
                           ("psweep", psweep_only),
                           ("ssweep", ssweep_only),
                           ("irr", irr_only)):
                tt = timeit_looped(ff, lv.op, xl)
                print(f"      {nm:10s} {tt*1e3:8.3f} ms")
    tr = mg.transfers[-1]
    t1 = timeit_looped(lambda tt, v: tt.restrict(v), tr, x, n_loop=8)
    xc = jnp.asarray(
        np.random.default_rng(9).standard_normal(levels[-2].op.n_slots), jnp.float32
    )
    t2 = timeit_looped(lambda tt, v: tt.prolong(v), tr, xc, n_loop=8)
    print(f"{'restrict(fine)':16s} {t1*1e3:8.3f} ms")
    print(f"{'prolong(fine)':16s} {t2*1e3:8.3f} ms")
    t = timeit_looped(lambda s, v: s.vmult(v), mg.smoothers[-1], x, n_loop=8)
    print(f"{'smoother.vmult':16s} {t*1e3:8.3f} ms (degree {mg_data.smoother.degree})")

    print("\ngather microbenchmark (cost per row, loop-in-jit):")
    src = jnp.asarray(np.random.default_rng(1).standard_normal(2_000_000), jnp.float32)
    for rows, width in [(400_000, 1), (100_000, 4), (16_000, 25), (16_000, 32),
                        (4_000, 128), (400_000, 4)]:
        idx = np.random.default_rng(2).integers(0, len(src) - width, size=rows)
        idx2 = jnp.asarray((idx[:, None] + np.arange(width)[None, :]).astype(np.int32))
        t = timeit_looped(lambda s, i_: s[i_].sum(-1), src, idx2)
        # NOTE: f signature here is f(o=src? ) - we pass src as o and idx as v
        print(f"  rows={rows:7d} width={width:3d}: {t*1e3:8.3f} ms "
              f"({t/rows*1e9:7.1f} ns/row, {t/(rows*width)*1e9:6.2f} ns/elem)")
    print("block-row gather ([rows] indices, trailing width slice):")
    for rows, width in [(16_000, 25), (16_000, 32), (100_000, 25), (400_000, 8)]:
        src2 = src[: (len(src) // width) * width].reshape(-1, width)
        idx = jnp.asarray(
            np.random.default_rng(3).integers(0, src2.shape[0], size=rows), jnp.int32
        )
        t = timeit_looped(lambda s, i_: s[i_].sum(-1), src2, idx)
        print(f"  rows={rows:7d} width={width:3d}: {t*1e3:8.3f} ms "
              f"({t/rows*1e9:7.1f} ns/row)")
    print("block-row scatter-SET ([rows] indices into [N, W] operand):")
    for rows, width in [(200, 1089), (6_600, 33), (2_000, 25), (16_000, 25)]:
        src2 = src[: (len(src) // width) * width].reshape(-1, width)
        idx = jnp.asarray(
            np.random.default_rng(5).integers(0, src2.shape[0], size=rows), jnp.int32
        )
        vals = jnp.ones((rows, width), jnp.float32)

        def rset(s, i_):
            return s.at[i_].set(vals)

        t = timeit_looped(rset, src2, idx)
        print(f"  rows={rows:7d} width={width:4d}: {t*1e3:8.3f} ms "
              f"({t/rows*1e9:7.1f} ns/row, {t/(rows*width)*1e9:6.2f} ns/elem)")
    print("block-row scatter-ADD ([rows] indices into [N, W] operand):")
    for rows, width in [(3_400, 33), (2_000, 25)]:
        src2 = src[: (len(src) // width) * width].reshape(-1, width)
        idx = jnp.asarray(
            np.random.default_rng(6).integers(0, src2.shape[0], size=rows), jnp.int32
        )
        vals = jnp.ones((rows, width), jnp.float32)

        def radd(s, i_):
            return s.at[i_].add(vals)

        t = timeit_looped(radd, src2, idx)
        print(f"  rows={rows:7d} width={width:4d}: {t*1e3:8.3f} ms "
              f"({t/rows*1e9:7.1f} ns/row, {t/(rows*width)*1e9:6.2f} ns/elem)")
    print("scatter-add microbenchmark:")
    for rows, width in [(400_000, 1), (16_000, 25)]:
        idx = np.random.default_rng(4).integers(0, len(src) - width, size=rows)
        idx2 = jnp.asarray((idx[:, None] + np.arange(width)[None, :]).astype(np.int32))
        vals = jnp.ones((rows, width), jnp.float32)

        def scat(s, i_):
            return s.at[i_].add(vals)

        t = timeit_looped(scat, src, idx2)
        print(f"  rows={rows:7d} width={width:3d}: {t*1e3:8.3f} ms "
              f"({t/rows*1e9:7.1f} ns/row)")


if __name__ == "__main__":
    main()
