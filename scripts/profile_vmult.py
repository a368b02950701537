"""Measure the per-component cost of the hybrid vmult + V-cycle on the TPU.

Times (best of reps, host-transfer fenced — the axon plugin's
block_until_ready is a no-op): full CG iteration, V-cycle, per-level vmult,
and the vmult's internal phases (stencil / sweeps / irregular / constraints /
masks), plus a gather microbenchmark that validates the rows-not-elements
cost model the optimizations rely on (DESIGN.md).

Usage: python scripts/profile_vmult.py [r] [p]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def fence(x):
    jnp.asarray(x).block_until_ready()
    # axon: block_until_ready does not synchronise; force a host transfer
    arr = np.asarray(jax.tree.leaves(x)[0]) if not hasattr(x, "ravel") else None
    if arr is None:
        float(jnp.asarray(x).ravel()[0])
    return x


def timeit(f, *args, reps=5):
    f(*args)  # warm-up / compile
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        r = f(*args)
        float(jnp.asarray(jax.tree.leaves(r)[0]).ravel()[0])
        best = min(best, time.perf_counter() - t0)
    return best


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
          f"sf buckets={len(op.sf_buckets)} "
          f"slave rows={int(op.slave_rep.shape[0])} ct={int(op.ct_target.shape[0])}")

    x = jnp.asarray(np.random.default_rng(0).standard_normal(op.n_slots), jnp.float32)

    jv = jax.jit(lambda o, v: o.vmult(v))
    jc = jax.jit(lambda o, v: o.cell_apply_raw(v))
    japc = jax.jit(lambda o, v: o.apply_c(v))
    japctf = jax.jit(lambda o, v: o.apply_ct_faces(v))
    jex = jax.jit(lambda o, v: o.exchange(v))
    japct = jax.jit(lambda o, v: o.apply_ct(v))

    def jirr(o, v):
        sums = [v[slots].sum(-1) for slots, _, _ in o.irr_buckets]
        for (slots, out_slots, out_group), s in zip(o.irr_buckets, sums):
            v = v.at[out_slots].set(s[out_group].astype(v.dtype))
        return v

    jirr = jax.jit(jirr)

    for name, f in [("vmult", jv), ("cell_apply_raw", jc), ("apply_c", japc),
                    ("apply_ct_faces", japctf), ("exchange", jex),
                    ("irr_only", jirr), ("apply_ct", japct)]:
        t = timeit(f, op, x)
        print(f"{name:16s} {t*1e3:8.2f} ms   {fine.dofh.n_dofs/t/1e6:8.1f} MDoF/s")

    # V-cycle + preconditioned step
    mg_data = MultigridParameters()
    mg_data.smoother.degree = 3
    mg_data.coarse_solver.type = "amg"
    mg = api.build_gc_preconditioner_hybrid(levels, mg_data, jnp.float32)
    precond = PreconditionMG(mg, jnp.float32)
    jpre = jax.jit(lambda m, v: m.vmult(v))
    t = timeit(jpre, precond, x)
    print(f"{'V-cycle':16s} {t*1e3:8.2f} ms")
    # per-level vmult
    for l, lv in enumerate(levels):
        xl = jnp.zeros(lv.op.n_slots, jnp.float32)
        t = timeit(jv, lv.op, xl)
        print(f"  level {l} vmult  {t*1e3:8.2f} ms   n_slots={lv.op.n_slots} NP={lv.op.NP} NS={lv.op.NS}")
    # transfers
    jres = jax.jit(lambda tr, v: tr.restrict(v))
    jpro = jax.jit(lambda tr, v: tr.prolong(v))
    tr = mg.transfers[-1]
    t1 = timeit(jres, tr, x)
    xc = jnp.zeros(levels[-2].op.n_slots, jnp.float32)
    t2 = timeit(jpro, tr, xc)
    print(f"{'restrict(fine)':16s} {t1*1e3:8.2f} ms")
    print(f"{'prolong(fine)':16s} {t2*1e3:8.2f} ms")

    # smoother apply at fine level
    jsm = jax.jit(lambda s, v: s.vmult(v))
    t = timeit(jsm, mg.smoothers[-1], x)
    print(f"{'smoother.vmult':16s} {t*1e3:8.2f} ms (degree {mg_data.smoother.degree})")

    # gather cost model: rows vs width
    print("\ngather microbenchmark (cost per row hypothesis):")
    src = jnp.asarray(np.random.default_rng(1).standard_normal(2_000_000), jnp.float32)
    for rows, width in [(400_000, 1), (100_000, 4), (16_000, 25), (16_000, 32),
                        (4_000, 128), (400_000, 4)]:
        idx = np.random.default_rng(2).integers(0, len(src) - width, size=rows)
        idx2 = (idx[:, None] + np.arange(width)[None, :]).astype(np.int32)
        idx2 = jnp.asarray(idx2)
        g = jax.jit(lambda s, i: s[i].sum())
        t = timeit(g, src, idx2)
        print(f"  rows={rows:7d} width={width:3d}: {t*1e3:7.3f} ms "
              f"({t/rows*1e9:6.1f} ns/row, {t/(rows*width)*1e9:6.2f} ns/elem)")
    # 2D block gather: [rows] indices with trailing slice width
    for rows, width in [(16_000, 25), (16_000, 32), (100_000, 25)]:
        src2 = src[: (len(src) // width) * width].reshape(-1, width)
        idx = jnp.asarray(
            np.random.default_rng(3).integers(0, src2.shape[0], size=rows), jnp.int32
        )
        g = jax.jit(lambda s, i: s[i].sum())
        t = timeit(g, src2, idx)
        print(f"  block rows={rows:7d} width={width:3d}: {t*1e3:7.3f} ms "
              f"({t/rows*1e9:6.1f} ns/row)")


if __name__ == "__main__":
    main()
