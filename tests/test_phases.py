"""Per-phase MG instrumentation (utils/phases.py) — the reference's 7 signal
hooks + 2 preconditioner-boundary timers (multigrid_throughput.cc:1152-1234,
1381-1401)."""

import jax.numpy as jnp

from dealii_multigrid_tpu import api
from dealii_multigrid_tpu.mesh import generators
from dealii_multigrid_tpu.solvers.multigrid import PreconditionMG
from dealii_multigrid_tpu.utils.params import RunParameters
from dealii_multigrid_tpu.utils.phases import (
    PHASES,
    format_per_level_table,
    profile_preconditioner,
    profile_preconditioner_per_level,
)


def _params():
    p = RunParameters()
    p.geometry_type = "quadrant"
    p.n_ref_global = 2
    p.fe_degree_fine = 2
    p.number_type = "float"
    p.mg_number_type = "float"
    p.mg_data.coarse_solver.type = "amg"
    p.mg_data.smoother.degree = 3
    p.mg_data.n_repetitions = 1
    return p


def test_profile_gc_phases():
    p = _params()
    p.type = "HMG-global"
    mesh = generators.create("quadrant", 3, 2, 0)
    res, prob, lvls = api.solve_with_global_coarsening_hybrid(p, mesh)
    precond = PreconditionMG(res.mg, jnp.float32)
    phases = profile_preconditioner(precond, res.rhs_used, n_loop=2)
    for ph in PHASES + ("to_mg", "to_global"):
        assert ph in phases
    for ph in ("pre", "post", "res", "pro", "cs"):
        assert phases[ph] >= 0.0
    assert phases["edge_pro"] == 0.0  # GC has no edge operators


def test_profile_per_level_table():
    """Per-level phase rows (the reference's per-level min/max/avg matrix
    analog, multigrid_throughput.cc:1285-1379): one entry per level per
    phase, and the formatted table lists every level."""
    p = _params()
    p.type = "HMG-global"
    mesh = generators.create("quadrant", 3, 2, 0)
    res, prob, lvls = api.solve_with_global_coarsening_hybrid(p, mesh)
    precond = PreconditionMG(res.mg, jnp.float32)
    per_level = profile_preconditioner_per_level(
        precond, res.rhs_used, n_loop=2
    )
    L = res.mg.n_levels - 1
    for ph in ("pre", "residuum", "res", "pro", "post", "edge_pro"):
        assert len(per_level[ph]) == L
        assert all(t >= 0.0 for t in per_level[ph])
    assert len(per_level["cs"]) == 1
    text = format_per_level_table(per_level)
    assert text.count("\n") == L + 1  # header + L levels + coarse line
    assert "coarse solve" in text


def test_profile_ls_phases_edge_pro():
    """edge_pro is measured (nonzero machinery) for local smoothing."""
    p = _params()
    p.type = "HMG-local"
    mesh = generators.create("quadrant", 3, 2, 0)
    res, prob, lvls = api.solve_with_local_smoothing(p, mesh)
    # result carries no mg for LS; rebuild the preconditioner
    from dealii_multigrid_tpu.solvers.local_smoothing import (
        build_local_smoothing_mg,
    )

    lsmg = build_local_smoothing_mg(lvls[0].dofh, p.mg_data, dtype=jnp.float32)
    phases = profile_preconditioner(lsmg, jnp.asarray(prob.rhs, jnp.float32), n_loop=2)
    for ph in PHASES + ("to_mg", "to_global"):
        assert ph in phases
