"""Per-phase multigrid timing (the reference's 7 MG signal hooks).

The reference instruments pre-smooth / residuum / restrict / coarse /
prolong / edge-prolong / post-smooth per level per repetition through
deal.II's Multigrid signals (multigrid_throughput.cc:1152-1234) and prints
them as ``time_pre .. time_post`` plus the two preconditioner-boundary
timers ``time_to_mg`` / ``time_to_global`` (:1381-1401).

Under jit the whole V-cycle is one fused XLA computation, and on the axon
TPU plugin every dispatched call carries ~35 ms of tunnel latency — so
phases are measured by looping each phase (applied at ALL its levels) N
times INSIDE one jit with a tiny scalar data dependency (preventing XLA
from hoisting loop-invariant work) and reporting (t(2N) - t(N)) / N.
Each phase costs two extra compiles; this is the opt-in ProfilePhases mode.

Handles both the global-coarsening Multigrid and LocalSmoothingMG; for the
latter ``edge_pro`` times the refinement-edge interface operators
(vmult_interface_down/up, reference include/operator.h:191-226) and
to_mg/to_global time the copy_to_mg/copy_from_mg index maps.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

PHASES = ("pre", "residuum", "res", "cs", "pro", "edge_pro", "post")


def _fence(out):
    float(jnp.asarray(jax.tree.leaves(out)[0]).ravel()[0])


def _loop_time(fn, ops, vecs, n_loop: int = 8, reps: int = 2) -> float:
    """Seconds per application of fn(ops, vecs) -> list of arrays, measured
    loop-in-jit as (t(2N) - t(N)) / N (removes dispatch latency)."""

    def make(n):
        @jax.jit
        def run(ops, vecs):
            out0 = fn(ops, vecs)
            accs0 = tuple(jnp.zeros_like(o) for o in jax.tree.leaves(out0))

            def body(k, accs):
                s = 1 + 1e-30 * accs[0].ravel()[0].astype(jnp.float32)
                vv = jax.tree.map(lambda v: v * s.astype(v.dtype), vecs)
                out = jax.tree.leaves(fn(ops, vv))
                return tuple(a + o for a, o in zip(accs, out))

            return jax.lax.fori_loop(0, n, body, accs0)

        return run

    r1, r2 = make(n_loop), make(2 * n_loop)
    _fence(r1(ops, vecs)), _fence(r2(ops, vecs))  # compile + warm
    t1 = t2 = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        _fence(r1(ops, vecs))
        t1 = min(t1, time.perf_counter() - t0)
        t0 = time.perf_counter()
        _fence(r2(ops, vecs))
        t2 = min(t2, time.perf_counter() - t0)
    return max((t2 - t1) / n_loop, 0.0)


def _rand_like(n, dtype, seed):
    return jnp.asarray(
        np.random.default_rng(seed).standard_normal(n), dtype=dtype
    )


def profile_v_cycle(mg, b, n_loop: int = 8) -> dict:
    """Per-phase seconds (one V-cycle, summed over levels) for a
    global-coarsening Multigrid (solvers/multigrid.py)."""
    L = mg.n_levels - 1
    dtype = b.dtype

    def vec(l, seed):
        op = mg.operators[l]
        n = getattr(op, "n_slots", None) or op.n_dofs
        return _rand_like(n, dtype, seed)

    d = [vec(l, 100 + l) for l in range(L + 1)]
    x = [vec(l, 200 + l) for l in range(L + 1)]
    fine = list(range(1, L + 1))

    out = {ph: 0.0 for ph in PHASES}
    out["pre"] = _loop_time(
        lambda m, v: [m.smoothers[l].vmult(v[l - 1]) for l in fine], mg, [d[l] for l in fine], n_loop
    )
    out["residuum"] = _loop_time(
        lambda m, v: [v[2 * (l - 1)] - m.operators[l].vmult(v[2 * (l - 1) + 1]) for l in fine],
        mg,
        [w for l in fine for w in (d[l], x[l])],
        n_loop,
    )
    out["res"] = _loop_time(
        lambda m, v: [m.transfers[l].restrict(v[l - 1]) for l in fine], mg, [d[l] for l in fine], n_loop
    )
    out["pro"] = _loop_time(
        lambda m, v: [m.transfers[l].prolong(v[l - 1]) for l in fine], mg, [d[l - 1] for l in fine], n_loop
    )
    out["post"] = _loop_time(
        lambda m, v: [m.smoothers[l].step(v[2 * (l - 1)], v[2 * (l - 1) + 1]) for l in fine],
        mg,
        [w for l in fine for w in (x[l], d[l])],
        n_loop,
    )
    out["cs"] = _loop_time(lambda m, v: [m.coarse_solve(v[0])], mg, [d[0]], n_loop)
    return out


def profile_ls_cycle(lsmg, b, n_loop: int = 8) -> dict:
    """Per-phase seconds for a LocalSmoothingMG (solvers/local_smoothing.py),
    including the refinement-edge interface work (edge_pro) and the
    copy_to_mg/copy_from_mg boundaries (to_mg/to_global)."""
    L = len(lsmg.levels) - 1
    dtype = b.dtype
    d = [_rand_like(lv.n_dofs, dtype, 300 + i) for i, lv in enumerate(lsmg.levels)]
    x = [_rand_like(lv.n_dofs, dtype, 400 + i) for i, lv in enumerate(lsmg.levels)]
    fine = list(range(1, L + 1))

    out = {ph: 0.0 for ph in PHASES}
    out["pre"] = _loop_time(
        lambda m, v: [m.smoothers[l].vmult(v[l - 1]) for l in fine], lsmg, [d[l] for l in fine], n_loop
    )
    out["residuum"] = _loop_time(
        lambda m, v: [v[2 * (l - 1)] - m.levels[l].vmult(v[2 * (l - 1) + 1]) for l in fine],
        lsmg,
        [w for l in fine for w in (d[l], x[l])],
        n_loop,
    )
    out["edge_pro"] = _loop_time(
        lambda m, v: [
            m.levels[l].interface_down(v[2 * (l - 1)])
            + m.levels[l].interface_up(v[2 * (l - 1) + 1])
            for l in fine
        ],
        lsmg,
        [w for l in fine for w in (x[l], x[l])],
        n_loop,
    )
    out["res"] = _loop_time(
        lambda m, v: [m.transfers[l].restrict(v[l - 1]) for l in fine], lsmg, [d[l] for l in fine], n_loop
    )
    out["pro"] = _loop_time(
        lambda m, v: [m.transfers[l].prolong(v[l - 1]) for l in fine], lsmg, [d[l - 1] for l in fine], n_loop
    )
    out["post"] = _loop_time(
        lambda m, v: [m.smoothers[l].step(v[2 * (l - 1)], v[2 * (l - 1) + 1]) for l in fine],
        lsmg,
        [w for l in fine for w in (x[l], d[l])],
        n_loop,
    )
    out["cs"] = _loop_time(lambda m, v: [m.coarse_solve(v[0])], lsmg, [d[0]], n_loop)

    # copy_to_mg / copy_from_mg boundaries (reference mg_precon_timers);
    # the hybrid LS carries its copy tables on the levels themselves
    hybrid = not hasattr(lsmg, "copy_maps")

    def to_mg(m, v):
        outs = []
        if hybrid:
            for lev in m.levels:
                dd = jnp.zeros(lev.n_dofs, v[0].dtype)
                outs.append(dd.at[lev.to_slots].set(v[0][lev.to_src]) * lev.keep)
        else:
            for lev, cm in zip(m.levels, m.copy_maps):
                dd = jnp.zeros(lev.n_dofs, v[0].dtype)
                outs.append(
                    dd.at[cm.level_idx].set(v[0][cm.global_idx]) * lev.keep
                )
        return outs

    def to_global(m, v):
        o = jnp.zeros(m.n_dofs_global, v[0].dtype)
        if hybrid:
            for lev, u in zip(m.levels, v[1:]):
                o = o.at[lev.from_slots].set(u[lev.from_src])
        else:
            for lev, cm, u in zip(m.levels, m.copy_maps, v[1:]):
                o = o.at[cm.global_idx].set(u[cm.level_idx])
        return [o]

    out["to_mg"] = _loop_time(to_mg, lsmg, [b], n_loop)
    out["to_global"] = _loop_time(to_global, lsmg, [b] + x, n_loop)
    return out


def profile_v_cycle_per_level(mg, b, n_loop: int = 8) -> dict:
    """Per-level per-phase seconds for a global-coarsening Multigrid:
    ``out[phase][l-1]`` = seconds of that phase at level l (levels 1..L; the
    coarse solve is its own 'cs' single-entry list).  The reference prints
    per-level min/max/avg matrices over MPI ranks
    (multigrid_throughput.cc:1285-1379, mg_tools.h tables); under XLA SPMD
    there is no per-device host timing, so the table is per level with one
    (all-device) value per cell."""
    L = mg.n_levels - 1
    dtype = b.dtype

    def vec(l, seed):
        op = mg.operators[l]
        n = getattr(op, "n_slots", None) or op.n_dofs
        return _rand_like(n, dtype, seed)

    d = [vec(l, 100 + l) for l in range(L + 1)]
    x = [vec(l, 200 + l) for l in range(L + 1)]
    out = {ph: [] for ph in PHASES}
    for l in range(1, L + 1):
        out["pre"].append(_loop_time(
            lambda m, v, l=l: [m.smoothers[l].vmult(v[0])], mg, [d[l]], n_loop))
        out["residuum"].append(_loop_time(
            lambda m, v, l=l: [v[0] - m.operators[l].vmult(v[1])],
            mg, [d[l], x[l]], n_loop))
        out["res"].append(_loop_time(
            lambda m, v, l=l: [m.transfers[l].restrict(v[0])],
            mg, [d[l]], n_loop))
        out["pro"].append(_loop_time(
            lambda m, v, l=l: [m.transfers[l].prolong(v[0])],
            mg, [d[l - 1]], n_loop))
        out["post"].append(_loop_time(
            lambda m, v, l=l: [m.smoothers[l].step(v[0], v[1])],
            mg, [x[l], d[l]], n_loop))
        out["edge_pro"].append(0.0)  # GC has no refinement-edge operators
    out["cs"] = [_loop_time(lambda m, v: [m.coarse_solve(v[0])], mg, [d[0]],
                            n_loop)]
    return out


def profile_ls_cycle_per_level(lsmg, b, n_loop: int = 8) -> dict:
    """Per-level per-phase seconds for a LocalSmoothingMG (see
    profile_v_cycle_per_level), including the refinement-edge interface
    work per level."""
    L = len(lsmg.levels) - 1
    dtype = b.dtype
    d = [_rand_like(lv.n_dofs, dtype, 300 + i)
         for i, lv in enumerate(lsmg.levels)]
    x = [_rand_like(lv.n_dofs, dtype, 400 + i)
         for i, lv in enumerate(lsmg.levels)]
    out = {ph: [] for ph in PHASES}
    for l in range(1, L + 1):
        out["pre"].append(_loop_time(
            lambda m, v, l=l: [m.smoothers[l].vmult(v[0])], lsmg, [d[l]],
            n_loop))
        out["residuum"].append(_loop_time(
            lambda m, v, l=l: [v[0] - m.levels[l].vmult(v[1])],
            lsmg, [d[l], x[l]], n_loop))
        out["edge_pro"].append(_loop_time(
            lambda m, v, l=l: [
                m.levels[l].interface_down(v[0])
                + m.levels[l].interface_up(v[1])
            ],
            lsmg, [x[l], x[l]], n_loop))
        out["res"].append(_loop_time(
            lambda m, v, l=l: [m.transfers[l].restrict(v[0])],
            lsmg, [d[l]], n_loop))
        out["pro"].append(_loop_time(
            lambda m, v, l=l: [m.transfers[l].prolong(v[0])],
            lsmg, [d[l - 1]], n_loop))
        out["post"].append(_loop_time(
            lambda m, v, l=l: [m.smoothers[l].step(v[0], v[1])],
            lsmg, [x[l], d[l]], n_loop))
    out["cs"] = [_loop_time(lambda m, v: [m.coarse_solve(v[0])], lsmg,
                            [d[0]], n_loop)]
    return out


def profile_preconditioner_per_level(precond, b, n_loop: int = 8) -> dict:
    """Per-level dispatch (see profile_preconditioner)."""
    from ..solvers.multigrid import PreconditionMG

    if isinstance(precond, PreconditionMG):
        return profile_v_cycle_per_level(
            precond.mg, b.astype(precond.mg.operators[-1].dtype), n_loop
        )
    lsmg = getattr(precond, "lsmg", precond)
    return profile_ls_cycle_per_level(
        lsmg, b.astype(lsmg.levels[-1].keep.dtype), n_loop
    )


def format_per_level_table(per_level: dict) -> str:
    """Reference-shaped per-level phase table (mg_tools.h-style rows)."""
    phases = [ph for ph in PHASES if ph != "cs"]
    L = max((len(per_level.get(ph, [])) for ph in phases), default=0)
    head = "level " + " ".join(f"{ph:>10}" for ph in phases)
    lines = [head]
    for i in range(L):
        cells = " ".join(
            f"{per_level[ph][i]:10.3e}" if i < len(per_level.get(ph, []))
            else f"{'-':>10}"
            for ph in phases
        )
        lines.append(f"{i + 1:<5} " + cells)
    cs = per_level.get("cs", [])
    if cs:
        lines.append(f"coarse solve: {cs[0]:.3e} s")
    return "\n".join(lines)


def profile_preconditioner(precond, b, n_loop: int = 8) -> dict:
    """Dispatch on preconditioner type; always returns the 7 PHASES plus
    to_mg / to_global."""
    from ..solvers.multigrid import PreconditionMG

    if isinstance(precond, PreconditionMG):
        out = profile_v_cycle(precond.mg, b.astype(precond.mg.operators[-1].dtype), n_loop)
        # precision-boundary casts (reference connect_transfer_to_mg/global)
        level_dtype = precond.mg.operators[-1].dtype
        out["to_mg"] = _loop_time(
            lambda m, v: [v[0].astype(level_dtype)], precond, [b], n_loop
        )
        out["to_global"] = _loop_time(
            lambda m, v: [v[0].astype(b.dtype)],
            precond,
            [b.astype(level_dtype)],
            n_loop,
        )
        return out
    # PreconditionLS wrapper (api.py) or a bare LocalSmoothingMG
    lsmg = getattr(precond, "lsmg", precond)
    return profile_ls_cycle(lsmg, b.astype(lsmg.levels[-1].keep.dtype), n_loop)
