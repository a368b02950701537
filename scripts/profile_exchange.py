"""Exchange-stage attribution at bench scale (split pipeline): psweeps /
ssweep / irregular buckets / cross terms, isolated per level.

profile_l6 measured exchange_ts at 2.75 ms (cross) / 2.34 ms (sweeps
only) of the 6.9 ms L6 vmult; L7's exchange_t was ~2.0 ms.  After ROWSF
lands, the exchange becomes the largest remaining constraint-pipeline
piece (~25 ms across the V-cycle's ~12 hot-level applies).

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/profile_exchange.py [r] [p]
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
                s = jnp.asarray(jax.tree.leaves(acc)[0]).ravel()[0]
                vv = jax.tree.map(
                    lambda a: a * (1 + 1e-30 * s.astype(a.dtype)), v
                )
                return jax.tree.map(lambda a, b: a + b, acc, f(o, vv))

            return jax.lax.fori_loop(
                0, n, body, jax.tree.map(jnp.zeros_like, out0)
            )

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
    from dealii_multigrid_tpu.ops.hybrid import TVec, _split_gather

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
        op = levels[li].op
        x = jnp.asarray(rng.standard_normal(op.n_slots), jnp.float32)
        xs = op._to_ts(x)
        print(
            f"--- L{li}: NP={op.NP} NS={op.NS} S={op.S} cross={op.use_cross} "
            f"irr={[tuple(np.asarray(s).shape) for s, _, _ in op.irr_buckets]}",
            flush=True,
        )

        def exch_full(o, v):
            return o._exchange_ts(v)

        def psweeps_only(o, v):
            S, NP = o.S, o.NP
            ut = v.head.reshape(S, S, S, NP)
            return TVec(o._psweeps_t(ut).reshape(-1), v.tail)

        def ssweep_only(o, v):
            return TVec(
                v.head, o._ssweep_rows(v.tail.reshape(o.NS, o.nloc)).reshape(-1)
            )

        def cross_core(o, v):
            ut = v.head.reshape(o.S, o.S, o.S, o.NP)
            us = v.tail.reshape(o.NS, o.nloc)
            a, b = o._exchange_cross_t_core(ut, us)
            return TVec(a.reshape(-1), b.reshape(-1))

        def irr_only(o, v):
            sp = o.tv["split"]
            h, t = v.head, v.tail
            sums = [
                _split_gather(ssp, h, t, slots.shape).sum(-1)
                for (ssp, _osp), (slots, _o, _g) in zip(
                    sp["irr"], o.irr_buckets
                )
            ]
            hp, tp = [], []
            from dealii_multigrid_tpu.ops.hybrid import _split_parts

            for ((_ssp, osp), (_s, _o2, g)), s in zip(
                zip(sp["irr"], o.irr_buckets), sums
            ):
                for side_, idx, vv in _split_parts(osp, s[g].astype(t.dtype)):
                    (hp if side_ == "h" else tp).append((idx, vv))
            h, t = o._ts_scatter(h, t, hp, tp, add=False)
            return TVec(h, t)

        probes = [("exchange_ts full", exch_full)]
        if op.use_cross:
            probes.append(("cross core", cross_core))
        else:
            probes.append(("psweeps only", psweeps_only))
            if op.NS and op.use_ssweep:
                probes.append(("ssweep only", ssweep_only))
        probes.append(("irr only", irr_only))
        for name, f in probes:
            t = timeit_looped(f, op, xs)
            print(f"  {name:18s} {t*1e3:8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
