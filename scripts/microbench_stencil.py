"""Microbenchmark: stencil formulations for the K^3 patch apply.

The 4D patch view [NP, S, S, S] (S = 33 at K=8/p=4) pays TPU tile padding
on its last two axes (33 -> 40 sublanes, 33 -> 128 lanes): every volume
pass touches ~4.7x the logical bytes.  Candidate reformulations phrase the
sum-factorized Laplace stencil

    r = (K (x) M (x) M + M (x) K (x) M + M (x) M (x) K) u

as dense 2D matmuls on lane-friendly views:

  A: current tensordot chain on [NP, S, S, S] (9 axis contractions)
  B: two z-contractions on [NP, S, S*S] + two [S^2, S^2] col matmuls
     (C1 = My (x) Mx, C2 = Ky (x) Mx + My (x) Kx):
         r = Kz u . C1^T + Mz u . C2^T
  C: same as B but the z-contractions also as one stacked matmul

Usage: python scripts/microbench_stencil.py [NP] [S]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

HIGHEST = jax.lax.Precision.HIGHEST


def _timed_call(run, *args):
    t0 = time.perf_counter()
    r = run(*args)
    float(jnp.asarray(jax.tree.leaves(r)[0]).ravel()[0])
    return time.perf_counter() - t0


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
    r1(o, v), r2(o, v)
    t1 = min(_timed_call(r1, o, v) for _ in range(reps))
    t2 = min(_timed_call(r2, o, v) for _ in range(reps))
    return (t2 - t1) / n_loop


def main():
    NP = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    S = int(sys.argv[2]) if len(sys.argv) > 2 else 33

    rng = np.random.default_rng(0)
    KS = jnp.asarray(rng.standard_normal((S, S)), jnp.float32)
    MS = jnp.asarray(rng.standard_normal((S, S)), jnp.float32)
    u = jnp.asarray(rng.standard_normal(NP * S**3), jnp.float32)
    scale = jnp.asarray(rng.standard_normal(NP), jnp.float32)

    # ---- A: current chain
    def stencil_a(mats, v):
        KS, MS, scale, _, _ = mats
        up = v.reshape(NP, S, S, S)

        def ax(uu, mat, axis):
            return jnp.moveaxis(
                jnp.tensordot(uu, mat, axes=([axis], [1]), precision=HIGHEST),
                -1, axis,
            )

        kx = ax(ax(ax(up, KS, 1), MS, 2), MS, 3)
        ky = ax(ax(ax(up, MS, 1), KS, 2), MS, 3)
        kz = ax(ax(ax(up, MS, 1), MS, 2), KS, 3)
        return ((kx + ky + kz) * scale[:, None, None, None]).reshape(-1)

    # ---- B: 2D-matmul form
    C1 = jnp.asarray(np.kron(np.asarray(MS), np.asarray(MS)), jnp.float32)
    C2 = jnp.asarray(
        np.kron(np.asarray(KS), np.asarray(MS))
        + np.kron(np.asarray(MS), np.asarray(KS)),
        jnp.float32,
    )

    def stencil_b(mats, v):
        KS, MS, scale, C1, C2 = mats
        u3 = v.reshape(NP, S, S * S)
        t1 = jnp.einsum("nzq,wz->nwq", u3, KS, precision=HIGHEST)
        t2 = jnp.einsum("nzq,wz->nwq", u3, MS, precision=HIGHEST)
        r = jnp.matmul(
            t1.reshape(NP * S, S * S), C1.T, precision=HIGHEST
        ) + jnp.matmul(t2.reshape(NP * S, S * S), C2.T, precision=HIGHEST)
        return (r.reshape(NP, S, S * S) * scale[:, None, None]).reshape(-1)

    # ---- C: z-contractions fused into one [2S, S] stacked weight
    W = jnp.concatenate([KS, MS], axis=0)  # [2S, S]

    def stencil_c(mats, v):
        KS, MS, scale, C1, C2 = mats
        u3 = v.reshape(NP, S, S * S)
        t = jnp.einsum("nzq,wz->nwq", u3, W, precision=HIGHEST)  # [NP, 2S, q]
        r = jnp.matmul(
            t[:, :S].reshape(NP * S, S * S), C1.T, precision=HIGHEST
        ) + jnp.matmul(t[:, S:].reshape(NP * S, S * S), C2.T, precision=HIGHEST)
        return (r.reshape(NP, S, S * S) * scale[:, None, None]).reshape(-1)

    mats = (KS, MS, scale, C1, C2)
    ra = stencil_a(mats, u)
    rb = stencil_b(mats, u)
    rc = stencil_c(mats, u)
    err_b = float(jnp.abs(ra - rb).max() / jnp.abs(ra).max())
    err_c = float(jnp.abs(ra - rc).max() / jnp.abs(ra).max())
    print(f"rel err B vs A: {err_b:.2e}   C vs A: {err_c:.2e}")

    for name, f in [("A tensordot4d", stencil_a), ("B 2Dmatmul", stencil_b),
                    ("C stacked", stencil_c)]:
        t = timeit_looped(f, mats, u)
        print(f"{name:16s} {t*1e3:8.3f} ms   "
              f"({NP * S**3 / t / 1e9:6.2f} GDoF/s)")

    # singleton sweep phrasing: [NS,5,5,5] 4D slices vs selection matmuls
    NS, n1 = 2135, 5
    nloc = n1**3
    us = jnp.asarray(rng.standard_normal((NS, nloc)), jnp.float32)
    nbr = jnp.asarray(rng.integers(0, NS, size=(6, NS)), jnp.int32)
    msk = jnp.asarray(rng.integers(0, 2, size=(6, NS)), jnp.float32)

    def ssweep_4d(tabs, v):
        nbr, msk, _, _ = tabs
        x = v.reshape(NS, n1, n1, n1)
        for d in range(3):
            axis = d + 1
            sl_top = [slice(None)] * 4
            sl_top[axis] = n1 - 1
            sl_bot = [slice(None)] * 4
            sl_bot[axis] = 0
            b3 = (-1, 1, 1)
            top = x[tuple(sl_top)]
            bot = x[tuple(sl_bot)]
            x = x.at[tuple(sl_bot)].add(top[nbr[2 * d]] * msk[2 * d].reshape(b3))
            x = x.at[tuple(sl_top)].add(bot[nbr[2 * d + 1]] * msk[2 * d + 1].reshape(b3))
        return x.reshape(NS, nloc)

    # selection matrices: columns of the face plane for (axis, side)
    sels = []
    loc = np.arange(nloc)
    iz, iy, ix = loc // (n1 * n1), (loc // n1) % n1, loc % n1
    crd = [iz, iy, ix]
    for d in range(3):
        for side in (0, 1):
            cols = np.nonzero(crd[d] == ((n1 - 1) if side else 0))[0]
            E = np.zeros((nloc, n1 * n1), np.float32)
            E[cols, np.arange(n1 * n1)] = 1.0
            sels.append(jnp.asarray(E))
    sels = tuple(sels)

    def ssweep_mm(tabs, v):
        nbr, msk, sels, _ = tabs
        x = v
        for d in range(3):
            Elo, Ehi = sels[2 * d], sels[2 * d + 1]
            top = jnp.matmul(x, Ehi, precision=HIGHEST)   # [NS, n1^2]
            bot = jnp.matmul(x, Elo, precision=HIGHEST)
            add_lo = top[nbr[2 * d]] * msk[2 * d][:, None]
            add_hi = bot[nbr[2 * d + 1]] * msk[2 * d + 1][:, None]
            x = x + jnp.matmul(add_lo, Elo.T, precision=HIGHEST) \
                  + jnp.matmul(add_hi, Ehi.T, precision=HIGHEST)
        return x

    tabs = (nbr, msk, sels, None)
    r4 = ssweep_4d(tabs, us)
    rm = ssweep_mm(tabs, us)
    err = float(jnp.abs(r4 - rm).max() / jnp.abs(r4).max())
    print(f"\nssweep rel err mm vs 4d: {err:.2e}")
    for name, f in [("ssweep 4d", ssweep_4d), ("ssweep matmul", ssweep_mm)]:
        t = timeit_looped(f, tabs, us)
        print(f"{name:16s} {t*1e3:8.3f} ms")


if __name__ == "__main__":
    main()
