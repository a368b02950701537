"""Microbenchmark: candidate formulations for the structured-face and
transfer index operations (decides the hybrid-engine layout rewrite).

Patterns, each timed loop-in-jit on the real TPU (see profile_vmult.py):
  A. element-indexed face gather r[face] ([n,S,S] arbitrary slot ids)
     vs axis-slice + block-row gather (plane = up[:,:,:,pos]; plane[fidx]).
  B. element-indexed face scatter-set vs slice + row scatter + writeback.
  C. true block-row gathers x2d[rows] for widths 25 / 125 / 1089 / 4913.
  D. block-row scatter-set and scatter-add for the same widths.
  E. octant-window scatter acc[cidx, ox:ox+sub, ...].add(v) vs
     gather-assemble (pad + add per octant).

Usage: python scripts/microbench_faces.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np


def _fence(r):
    float(jnp.asarray(jax.tree.leaves(r)[0]).ravel()[0])


def timeit_looped(f, o, v, n_loop=16, reps=3):
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
    _fence(r1(o, v)), _fence(r2(o, v))
    t1 = min((lambda: (lambda t0: ( _fence(r1(o, v)), time.perf_counter() - t0)[1])(time.perf_counter()))() for _ in range(reps))
    t2 = min((lambda: (lambda t0: ( _fence(r2(o, v)), time.perf_counter() - t0)[1])(time.perf_counter()))() for _ in range(reps))
    return (t2 - t1) / n_loop


def main():
    rng = np.random.default_rng(0)
    NP, S = 64, 33
    vol = jnp.asarray(rng.standard_normal(NP * S**3), jnp.float32)
    n_face = 48
    fidx_np = rng.choice(NP, n_face, replace=False)
    fidx = jnp.asarray(fidx_np, jnp.int32)
    # element table: x-low face of each patch (axis 1 pos 0): arbitrary ids
    base = fidx_np * S**3
    ij = np.arange(S)
    plane_z = (ij[:, None] * S + ij[None, :])  # [S,S] (y,z) at x=0
    face_tbl = jnp.asarray(base[:, None, None] + plane_z[None], jnp.int32)
    vals = jnp.asarray(rng.standard_normal((n_face, S, S)), jnp.float32)

    t = timeit_looped(lambda o, v: v[o].sum(), face_tbl, vol)
    print(f"A1 element face gather  [48,33,33]: {t*1e3:8.3f} ms")

    def slice_gather(fi, v):
        up = v.reshape(NP, S, S, S)
        plane = up[:, 0, :, :]
        return plane[fi].sum()

    t = timeit_looped(slice_gather, fidx, vol)
    print(f"A2 slice+rowgather      [48,33,33]: {t*1e3:8.3f} ms")

    t = timeit_looped(lambda o, v: v.at[o].set(vals.astype(v.dtype)), face_tbl, vol)
    print(f"B1 element face scatter-set        : {t*1e3:8.3f} ms")

    def slice_scatter(fi, v):
        up = v.reshape(NP, S, S, S)
        plane = up[:, 0, :, :]
        plane = plane.at[fi].set(vals.astype(v.dtype))
        return up.at[:, 0, :, :].set(plane).reshape(-1)

    t = timeit_looped(slice_scatter, fidx, vol)
    print(f"B2 slice+rowscatter+writeback      : {t*1e3:8.3f} ms")

    def slice_scatter_add(fi, v):
        up = v.reshape(NP, S, S, S)
        plane = jnp.zeros((NP, S, S), v.dtype).at[fi].add(vals.astype(v.dtype))
        return up.at[:, 0, :, :].add(plane).reshape(-1)

    t = timeit_looped(slice_scatter_add, fidx, vol)
    print(f"B3 rowscatter-add into zeros + add : {t*1e3:8.3f} ms")

    print()
    for rows, width in [(1380, 25), (2135, 125), (48, 1089), (64, 4913), (2135, 25)]:
        src2 = jnp.asarray(rng.standard_normal((4096, width)), jnp.float32)
        idx = jnp.asarray(rng.integers(0, 4096, rows), jnp.int32)
        t = timeit_looped(lambda i_, s: s[i_].sum(), idx, src2)
        print(f"C  block-row gather rows={rows:5d} w={width:5d}: {t*1e3:8.3f} ms ({t/rows*1e9:7.1f} ns/row)")
        upd = jnp.asarray(rng.standard_normal((rows, width)), jnp.float32)
        t = timeit_looped(lambda i_, s: s.at[i_].set(upd.astype(s.dtype)), idx, src2)
        print(f"D  block-row scat-set rows={rows:5d} w={width:5d}: {t*1e3:8.3f} ms ({t/rows*1e9:7.1f} ns/row)")
        t = timeit_looped(lambda i_, s: s.at[i_].add(upd.astype(s.dtype)), idx, src2)
        print(f"D' block-row scat-add rows={rows:5d} w={width:5d}: {t*1e3:8.3f} ms ({t/rows*1e9:7.1f} ns/row)")

    print()
    # E: octant windows, level6->5 shape: 64 fine -> 8 coarse, sub=17
    NC, sub = 8, 17
    acc = jnp.asarray(rng.standard_normal((NC, S, S, S)), jnp.float32)
    v64 = jnp.asarray(rng.standard_normal((64, sub, sub, sub)), jnp.float32)
    cidx = jnp.asarray(rng.integers(0, NC, 64), jnp.int32)

    def win_scatter(ci, a):
        return a.at[ci, 0:sub, 0:sub, 0:sub].add(v64.astype(a.dtype))

    t = timeit_looped(win_scatter, cidx, acc)
    print(f"E1 window scatter-add 64x17^3 into [8,33,33,33]: {t*1e3:8.3f} ms")

    child = jnp.asarray(rng.integers(0, 64, NC), jnp.int32)

    def gather_assemble(ch, a):
        g = v64[ch].astype(a.dtype)              # [NC, sub,sub,sub]
        return a.at[:, 0:sub, 0:sub, 0:sub].add(g)

    t = timeit_looped(gather_assemble, child, acc)
    print(f"E2 gather-assemble one octant                  : {t*1e3:8.3f} ms")

    def win_gather(ci, a):
        return a[ci, 0:sub, 0:sub, 0:sub].sum()

    t = timeit_looped(win_gather, cidx, acc)
    print(f"E3 window gather a[cidx, :17,:17,:17]          : {t*1e3:8.3f} ms")

    def slice_then_rows(ci, a):
        sl = a[:, 0:sub, 0:sub, 0:sub].reshape(NC, -1)
        return sl[ci].sum()

    t = timeit_looped(slice_then_rows, cidx, acc)
    print(f"E4 slice+rowgather                             : {t*1e3:8.3f} ms")


if __name__ == "__main__":
    main()
