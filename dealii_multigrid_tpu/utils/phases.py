"""Per-phase multigrid timing (the reference's 7 MG signal hooks).

The reference instruments pre-smooth / residual / restrict / coarse /
prolong / edge / post-smooth per level per repetition through deal.II's
Multigrid signals (multigrid_throughput.cc:1152-1234).  Under jit the whole
V-cycle is one fused XLA computation, so phase times cannot be observed from
inside the production solve; instead this module re-executes the identical
cycle with each phase as its own jitted call and a block_until_ready fence —
the reference-table columns (time_pre, time_residuum, time_res, time_cs,
time_pro, time_post) come from here, while headline timings come from the
fused solve.
"""

from __future__ import annotations

import time
from collections import defaultdict

import jax

PHASES = ("pre", "residuum", "res", "cs", "pro", "edge_pro", "post")


def profile_v_cycle(mg, b, n_reps: int = 3) -> dict:
    """Times per phase (seconds, summed over levels, best of n_reps)."""
    L = mg.n_levels - 1
    pre = [None] + [jax.jit(lambda sm, d, _l=l: mg.smoothers[_l].vmult(d)) for l in range(1, L + 1)]
    res = [None] + [
        jax.jit(lambda op, d, u, _l=l: d - mg.operators[_l].vmult(u))
        for l in range(1, L + 1)
    ]
    rst = [None] + [jax.jit(lambda tr, r, _l=l: mg.transfers[_l].restrict(r)) for l in range(1, L + 1)]
    pro = [None] + [jax.jit(lambda tr, u, _l=l: mg.transfers[_l].prolong(u)) for l in range(1, L + 1)]
    pst = [None] + [
        jax.jit(lambda sm, x, d, _l=l: mg.smoothers[_l].step(x, d))
        for l in range(1, L + 1)
    ]
    cs = jax.jit(lambda solver, d: solver(d))

    best = None
    for _ in range(n_reps + 1):  # first rep = warm-up/compile
        acc = defaultdict(float)

        def timed(key, fn, *args):
            t0 = time.perf_counter()
            out = fn(*args)
            _ = float(jax.numpy.ravel(out)[0])  # true execution fence
            acc[key] += time.perf_counter() - t0
            return out

        def v(l, d):
            if l == 0:
                return timed("cs", cs, mg.coarse_solve, d)
            x = timed("pre", pre[l], mg.smoothers[l], d)
            r = timed("residuum", res[l], mg.operators[l], d, x)
            dc = timed("res", rst[l], mg.transfers[l], r)
            xc = v(l - 1, dc)
            c = timed("pro", pro[l], mg.transfers[l], xc)
            x = x + c
            return timed("post", pst[l], mg.smoothers[l], x, d)

        v(L, b)
        total = sum(acc.values())
        if best is None or total < sum(best.values()):
            best = dict(acc)
    for ph in PHASES:
        best.setdefault(ph, 0.0)
    return best
