"""Transpose strategies at the tv boundary shape [NP, S^3] <-> [S^3, NP].

The tv pipeline pays ~1.9 ms per direction at r=7/p=4 (NP=512, S=33) for
XLA's native transpose — ~5x the ~0.4 ms HBM floor.  Candidates:
  A. xla transpose:      x.T (what _to_t does today)
  B. one-hot GEMM:       dot_general(x, I_NP, contract dim0) — rides the MXU
                         (exact: one product per output, any precision)
  C. reshape-transpose:  x.reshape(NP, S, S^2) -> [S, S^2, NP] -> reshape

Usage: PYTHONPATH=... python scripts/microbench_transpose.py [NP] [S]
"""

import os
import sys
import time

if os.environ.get("MGTPU_PLATFORM"):
    import jax as _j

    _j.config.update("jax_platforms", os.environ["MGTPU_PLATFORM"])

import jax
import jax.numpy as jnp
import numpy as np

HIGHEST = jax.lax.Precision.HIGHEST


def timeit_looped(f, v, n_loop=8, reps=2):
    def make(n):
        @jax.jit
        def run(v):
            out0 = f(v)

            def body(k, acc):
                s = acc.ravel()[0]
                return acc + f(v * (1 + 1e-30 * s))

            return jax.lax.fori_loop(0, n, body, jnp.zeros_like(out0))

        return run

    def timed(run):
        t0 = time.perf_counter()
        r = run(v)
        float(r.ravel()[0])
        return time.perf_counter() - t0

    r1, r2 = make(n_loop), make(2 * n_loop)
    r1(v), r2(v)
    t1 = min(timed(r1) for _ in range(reps))
    t2 = min(timed(r2) for _ in range(reps))
    return (t2 - t1) / n_loop


def main():
    NP = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    S = int(sys.argv[2]) if len(sys.argv) > 2 else 33
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((NP, S**3)), jnp.float32)
    eye = jnp.eye(NP, dtype=jnp.float32)

    def t_xla(v):
        return v.T

    def t_gemm(v):
        return jax.lax.dot_general(
            v, eye, dimension_numbers=(((0,), (0,)), ((), ())),
            precision=HIGHEST,
        )

    def t_resh(v):
        return jnp.moveaxis(v.reshape(NP, S, S * S), 0, 2).reshape(S**3, NP)

    a = np.asarray(t_xla(x))
    for name, f in (("xla.T", t_xla), ("onehot-GEMM", t_gemm),
                    ("reshape-move", t_resh)):
        b = np.asarray(jax.jit(f)(x))
        ok = np.array_equal(a.reshape(S**3, NP), b.reshape(S**3, NP))
        t = timeit_looped(f, x)
        print(f"  {name:14s} {t*1e3:8.3f} ms  exact={ok}", flush=True)
    # reverse direction
    xt = jnp.asarray(np.asarray(x).T.copy())

    def r_xla(v):
        return v.T

    def r_gemm(v):
        return jax.lax.dot_general(
            eye, v, dimension_numbers=(((0,), (1,)), ((), ())),
            precision=HIGHEST,
        )

    a = np.asarray(r_xla(xt))
    for name, f in (("rev xla.T", r_xla), ("rev onehot", r_gemm)):
        b = np.asarray(jax.jit(f)(xt))
        ok = np.array_equal(a.reshape(NP, S**3), b.reshape(NP, S**3))
        t = timeit_looped(f, xt)
        print(f"  {name:14s} {t*1e3:8.3f} ms  exact={ok}", flush=True)


if __name__ == "__main__":
    main()
