"""Microbench: outer-CG vector ops at bench scale (19.4M f32 slots).

profile_r7 (round-4e) leaves ~38 ms/iteration above V-cycle + A.p — the
CG body's 3 reductions + 4 axpys, ~25x the HBM floor, while the SAME
class of elementwise ops fused inside the smoother recurrence is ~free.
This isolates each op shape so the fix targets the real tax:

  axpy           x + a*y                      (2 reads 1 write, fusable)
  sum_flat       jnp.sum(x * y) on [N]
  sum_2d         jnp.sum on [N/128, 128] reshape (tile-aligned reduce)
  dot_mxu        [1, N] @ [N, 1] ones-matvec (MXU-side reduction)
  sum3_fused     three dots of the same operands in one program
  select         jnp.where(scalar, x, y) (the chain mask)
  cg_vec_tail    the exact per-iteration vector tail: 3 dots + 4 axpys

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/microbench_vecops.py [n]
"""

import os

if os.environ.get("MGTPU_PLATFORM"):  # CPU smoke-testing
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


def timeit_looped(f, v, n_loop=16, reps=3):
    """(t(2n) - t(n)) / n with a scalar data dependency between iterations."""

    def make(n):
        @jax.jit
        def run(v):
            out0 = f(v)

            def body(k, acc):
                s = jax.tree.leaves(acc)[0].ravel()[0].astype(jnp.float32)
                vv = jax.tree.map(lambda x: x * (1 + 1e-30 * s.astype(x.dtype)), v)
                return jax.tree.map(jnp.add, acc, f(vv))

            return jax.lax.fori_loop(0, n, body, out0)

        return run

    r1, r2 = make(n_loop), make(2 * n_loop)
    t0 = time.time()
    r1(v), r2(v)
    cs = time.time() - t0
    t1 = min(_timed_call(r1, v) for _ in range(reps))
    t2 = min(_timed_call(r2, v) for _ in range(reps))
    return (t2 - t1) / n_loop, cs


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 19381494
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(n), jnp.float32)
    y = jnp.asarray(rng.standard_normal(n), jnp.float32)
    n128 = (n // 128) * 128

    cases = [
        ("axpy", lambda v: (v[0] + 0.37 * v[1], v[1])),
        ("sum_flat", lambda v: jnp.sum(v[0] * v[1])),
        ("sum_2d", lambda v: jnp.sum(
            (v[0][:n128] * v[1][:n128]).reshape(-1, 128)
        )),
        ("dot_mxu", lambda v: jax.lax.dot_general(
            (v[0] * v[1])[None, :], jnp.ones((n, 1), jnp.float32),
            dimension_numbers=(((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
        )[0, 0]),
        ("sum3_fused", lambda v: jnp.sum(v[0] * v[1]) + jnp.sum(v[0] * v[0])
         + jnp.sum(v[1] * v[1])),
        ("select", lambda v: (jnp.where(v[0][0] > 0, v[0], v[1]), v[1])),
        ("cg_vec_tail", _cg_vec_tail),
    ]
    for name, f in cases:
        t, cs = timeit_looped(f, (x, y))
        print(f"{name:12s} {t*1e3:8.3f} ms (compile {cs:.0f}s)", flush=True)


def _cg_vec_tail(v):
    # the per-iteration vector work with A.p and M(r) replaced by aliases:
    # rz = r.z ; beta ; p ; pAp ; alpha ; x ; r ; ||r||
    r, z = v
    rz = jnp.sum(r * z)
    beta = (rz / (rz + 1.0)).astype(r.dtype)
    p = z + beta * r
    pap = jnp.sum(p * z)
    alpha = (rz / pap).astype(r.dtype)
    xn = alpha * p
    rn = r - alpha * z
    return xn + rn + jnp.sqrt(jnp.abs(jnp.sum(rn * rn)))


if __name__ == "__main__":
    main()
