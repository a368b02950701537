"""Layout microbenchmarks at the r=7/p=4 hot shapes.

Hypothesis (DESIGN.md round-3c): every XLA op on the [NP, S, S, S] patch
lattice (S=33) pays (8,128) tile padding on the two minor dims — 33x33 ->
40x128 = 4.7x — and ops on the [NS, n1, n1, n1] singleton lattice (n1=5)
pay 5x5 -> 8x128 = 41x.  Candidate cures, measured head-to-head here:

  A. stencil as-is: 9 tensordots on [NP, S, S, S]
  B. stencil transpose-sandwich: one transpose to [S*S*S, NP] (lane-dense,
     NP=512=4x128), contractions over leading dims, transpose back
  C. singleton sweeps as-is: slice/gather on [NS, n1, n1, n1]
  D. singleton sweeps as row GEMMs: [NS, nloc] @ plane-selector matrices

Usage: PYTHONPATH=... python scripts/microbench_lattice.py [NP] [S] [NS] [n1]
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

HIGHEST = jax.lax.Precision.HIGHEST


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
    NP = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    S = int(sys.argv[2]) if len(sys.argv) > 2 else 33
    NS = int(sys.argv[3]) if len(sys.argv) > 3 else 7854
    n1 = int(sys.argv[4]) if len(sys.argv) > 4 else 5
    nloc = n1 **3

    rng = np.random.default_rng(0)
    KS = jnp.asarray(rng.standard_normal((S, S)), jnp.float32)
    MS = jnp.asarray(rng.standard_normal((S, S)), jnp.float32)
    x = jnp.asarray(rng.standard_normal(NP * S**3), jnp.float32)
    print(f"patch: NP={NP} S={S} ({NP*S**3*4/1e6:.0f} MB flat)", flush=True)

    # ---- A: current stencil -------------------------------------------------
    def ax_(u, mat, axis):
        return jnp.moveaxis(
            jnp.tensordot(u, mat, axes=([axis], [1]), precision=HIGHEST), -1, axis
        )

    def stencil_a(mats, v):
        KS, MS = mats
        up = v.reshape(NP, S, S, S)
        kx = ax_(ax_(ax_(up, KS, 1), MS, 2), MS, 3)
        ky = ax_(ax_(ax_(up, MS, 1), KS, 2), MS, 3)
        kz = ax_(ax_(ax_(up, MS, 1), MS, 2), KS, 3)
        return (kx + ky + kz).reshape(-1)

    # ---- B: transpose sandwich ---------------------------------------------
    # [NP, S^3] -> [S^3, NP] -> [S, S, S, NP]; contract LEADING axes, lanes
    # (NP) untouched; transpose back at the end.
    def ax_lead(u, mat, axis):
        # u [S, S, S, NP], contract over `axis` in {0,1,2}
        return jnp.moveaxis(
            jnp.tensordot(mat, u, axes=([1], [axis]), precision=HIGHEST), 0, axis
        )

    def stencil_b(mats, v):
        KS, MS = mats
        ut = v.reshape(NP, S**3).T.reshape(S, S, S, NP)
        kx = ax_lead(ax_lead(ax_lead(ut, KS, 0), MS, 1), MS, 2)
        ky = ax_lead(ax_lead(ax_lead(ut, MS, 0), KS, 1), MS, 2)
        kz = ax_lead(ax_lead(ax_lead(ut, MS, 0), MS, 1), KS, 2)
        out = (kx + ky + kz).reshape(S**3, NP).T
        return out.reshape(-1)

    # ---- B2: transpose only (cost of the sandwich itself) -------------------
    def transpose_only(mats, v):
        ut = v.reshape(NP, S**3).T
        return ut.reshape(S**3, NP).T.reshape(-1) * 1.000001

    for name, f in (("stencil[NP,S,S,S] (A)", stencil_a),
                    ("stencil[S,S,S,NP] (B)", stencil_b),
                    ("transpose sandwich only", transpose_only)):
        t = timeit_looped(f, (KS, MS), x)
        print(f"  {name:28s} {t*1e3:8.3f} ms", flush=True)

    # sanity: same math
    ra = stencil_a((KS, MS), x)
    rb = stencil_b((KS, MS), x)
    err = float(jnp.max(jnp.abs(ra - rb)) / jnp.max(jnp.abs(ra)))
    print(f"  A vs B rel err: {err:.2e}", flush=True)

    # ---- singleton sweeps ----------------------------------------------------
    print(f"single: NS={NS} n1={n1}", flush=True)
    xs = jnp.asarray(rng.standard_normal((NS, nloc)), jnp.float32)
    snbr = jnp.asarray(rng.integers(0, NS, size=(6, NS)), jnp.int32)
    smask = jnp.asarray(rng.random((6, NS)) < 0.5, jnp.float32)

    # C: lattice view sweep (current exchange form)
    def sweep_c(nbrm, us_flat):
        snbr, smask = nbrm
        us = us_flat.reshape(NS, n1, n1, n1)
        for d in range(3):
            axis = d + 1
            sl_top = [slice(None)] * 4
            sl_top[axis] = n1 - 1
            sl_bot = [slice(None)] * 4
            sl_bot[axis] = 0
            bshape = (-1, 1, 1)
            top = us[tuple(sl_top)]
            bot = us[tuple(sl_bot)]
            us = us.at[tuple(sl_bot)].add(top[snbr[2 * d]] * smask[2 * d].reshape(bshape))
            us = us.at[tuple(sl_top)].add(bot[snbr[2 * d + 1]] * smask[2 * d + 1].reshape(bshape))
        return us.reshape(NS, nloc)

    # D: row-GEMM sweep.  T_lo[d] = "read the neighbour row's TOP face, write
    # it onto MY BOTTOM face" as ONE [nloc, nloc] matrix (hi-selector @
    # lo-selector^T), so each face term is a lane-dense block-row gather +
    # [NS, nloc] @ [nloc, nloc] GEMM — no lattice view, no (8,128) padding.
    loc = np.indices((n1, n1, n1)).reshape(3, -1)  # [3, nloc] z,y,x
    Ts = []
    for d in range(3):
        sel = []
        for side in (0, 1):
            on = loc[d] == (0 if side == 0 else n1 - 1)
            cols = np.nonzero(on)[0]
            Msel = np.zeros((nloc, n1 * n1), np.float32)
            Msel[cols, np.arange(n1 * n1)] = 1.0
            sel.append(Msel)
        lo, hi = sel
        Ts.append(jnp.asarray(hi @ lo.T))  # neighbour top -> my bottom
        Ts.append(jnp.asarray(lo @ hi.T))  # neighbour bottom -> my top
    Ts = tuple(Ts)

    def sweep_d(nbrm, us):
        snbr, smask = nbrm
        for d in range(3):
            nb_lo = us[snbr[2 * d]] * smask[2 * d][:, None]
            nb_hi = us[snbr[2 * d + 1]] * smask[2 * d + 1][:, None]
            us = us + jnp.matmul(nb_lo, Ts[2 * d], precision=HIGHEST) \
                    + jnp.matmul(nb_hi, Ts[2 * d + 1], precision=HIGHEST)
        return us

    for name, f in (("ssweep lattice (C)", sweep_c), ("ssweep row-GEMM (D)", sweep_d)):
        t = timeit_looped(f, (snbr, smask), xs)
        print(f"  {name:28s} {t*1e3:8.3f} ms", flush=True)
    rc = sweep_c((snbr, smask), xs)
    rd = sweep_d((snbr, smask), xs)
    err = float(jnp.max(jnp.abs(rc - rd)) / jnp.max(jnp.abs(rc)))
    print(f"  C vs D rel err: {err:.2e}", flush=True)


if __name__ == "__main__":
    main()
