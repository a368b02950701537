"""Multigrid solve tests: iteration counts, correctness, mixed precision.

The reference's own verification layers are CG convergence behaviour and
iteration counts (SURVEY.md §4); multigrid theory guarantees bounded,
mesh-independent counts for a correct hierarchy.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from dealii_multigrid_tpu import api
from dealii_multigrid_tpu.models import poisson as P
from dealii_multigrid_tpu.utils.params import RunParameters


def _params(typ, r, p=2, coarse="amg", reltol=1e-4, geo="quadrant"):
    prm = RunParameters()
    prm.type = typ
    prm.geometry_type = geo
    prm.n_ref_global = r
    prm.fe_degree_fine = p
    prm.number_type = "double"
    prm.mg_number_type = "double"
    prm.mg_data.coarse_solver.type = coarse
    prm.mg_data.smoother.degree = 3
    prm.mg_data.cg_normal.reltol = reltol
    prm.mg_data.n_repetitions = 1
    return prm


@pytest.mark.parametrize("typ", ["HMG-global", "PMG", "HPMG"])
def test_iteration_counts_bounded_and_mesh_independent(typ):
    counts = []
    for r in (2, 3):
        res, prob, levels = api.run(_params(typ, r))
        assert res.converged
        counts.append(res.n_iterations)
    assert max(counts) <= 8, counts
    assert abs(counts[0] - counts[1]) <= 2, counts


def test_solution_correct_vs_plain_cg():
    prm = _params("HMG-global", 3, p=2, reltol=1e-10)
    res, prob, levels = api.run(prm)
    # residual actually small in the constrained system
    r = prob.rhs - prob.op.vmult(res.x)
    assert float(jnp.linalg.norm(r)) <= 1e-9 * float(jnp.linalg.norm(prob.rhs))


def test_gaussian_l2_error_decreases():
    errs = []
    for r in (3, 4):
        prm = _params("HMG-global", r, p=2, reltol=1e-8)
        prm.simulation_type = "Gaussian"
        res, prob, levels = api.run(prm)
        u = prob.full_solution(res.x)
        errs.append(float(P.l2_error(prob, u)))
    assert errs[1] < errs[0]


def test_mixed_precision_float_levels():
    prm = _params("HMG-global", 3, p=2)
    prm.mg_number_type = "float"  # float MG under double CG (reference default)
    res, prob, levels = api.run(prm)
    assert res.converged
    assert res.n_iterations <= 8


def test_parameter_study_fixed_iterations():
    prm = _params("HMG-global", 2, p=2)
    prm.mg_data.do_parameter_study = True
    prm.mg_data.cg_parameter_study.maxiter = 5
    res, prob, levels = api.run(prm)
    assert res.n_iterations == 5


@pytest.mark.parametrize("coarse", ["cg", "cg_with_chebyshev", "amg"])
def test_coarse_solver_variants(coarse):
    res, prob, levels = api.run(_params("HMG-global", 2, p=2, coarse=coarse))
    assert res.converged and res.n_iterations <= 8


def test_amg_path():
    res, prob, levels = api.run(_params("AMG", 2, p=1))
    assert res.converged


def test_hybrid_ls_vcycle_matches_gather_engine():
    """The hybrid-engine LS V-cycle (solvers/local_smoothing.py,
    LocalSmoothingMGHybrid) is the SAME linear operator as the validated
    gather-engine LS V-cycle, once the Chebyshev intervals are equalised."""
    import dataclasses as dc

    from dealii_multigrid_tpu.mesh import generators as G
    from dealii_multigrid_tpu.mesh.dof import distribute_dofs
    from dealii_multigrid_tpu.ops.hybrid import build_hybrid_format
    from dealii_multigrid_tpu.solvers.local_smoothing import (
        build_local_smoothing_mg,
        build_local_smoothing_mg_hybrid,
    )
    from dealii_multigrid_tpu.utils.params import MultigridParameters

    mesh = G.create_quadrant(3, 3)
    dofh = distribute_dofs(mesh, 2)
    mg_data = MultigridParameters()
    mg_data.smoother.degree = 3
    lsg = build_local_smoothing_mg(dofh, mg_data, dtype=jnp.float64)
    fmt = build_hybrid_format(dofh, K=8)
    lsh = build_local_smoothing_mg_hybrid(dofh, fmt, mg_data, dtype=jnp.float64)
    # equalise the (estimation-seed-dependent) Chebyshev intervals
    lsh.smoothers = tuple(
        [None]
        + [
            dc.replace(sh, theta=sg.theta, delta=sg.delta)
            for sh, sg in zip(lsh.smoothers[1:], lsg.smoothers[1:])
        ]
    )
    rng = np.random.default_rng(3)
    r = rng.standard_normal(dofh.n_dofs)
    out_g = np.asarray(lsg.vmult(jnp.asarray(r)))
    out_h_slots = np.asarray(lsh.vmult(jnp.asarray(fmt.from_global(r))))
    out_h = out_h_slots[fmt.rep_slot]
    # slot consistency of the hybrid output
    assert np.allclose(out_h_slots, fmt.from_global(out_h), atol=1e-12)
    assert np.allclose(out_g, out_h, rtol=1e-10, atol=1e-11)


@pytest.mark.parametrize("typ", ["HMG-local", "HPMG-local"])
def test_local_smoothing_variants(typ):
    counts = []
    for r in (2, 3):
        res, prob, _ = api.run(_params(typ, r, p=2))
        assert res.converged
        rres = float(
            jnp.linalg.norm(prob.rhs - prob.op.vmult(res.x))
            / jnp.linalg.norm(prob.rhs)
        )
        assert rres < 1.1e-4
        counts.append(res.n_iterations)
    assert max(counts) <= 8 and abs(counts[0] - counts[1]) <= 2


@pytest.mark.parametrize("typ", ["HMG-local", "HPMG-local"])
def test_local_smoothing_kadapt_parity(typ, monkeypatch):
    """Adaptive per-level K in the LS hierarchy (ls_mode cross-K transfers,
    id_oct octant identity engages on the conforming level meshes): same
    iterations and residual quality as the uniform-K build."""
    res_u, _, _ = api.run(_params(typ, 4, p=2))
    monkeypatch.setenv("MGTPU_KADAPT", "8")  # tiny target: triggers halving
    res_a, prob, _ = api.run(_params(typ, 4, p=2))
    assert res_a.converged and res_u.converged
    assert res_a.n_iterations == res_u.n_iterations
    rres = float(
        jnp.linalg.norm(prob.rhs - prob.op.vmult(res_a.x))
        / jnp.linalg.norm(prob.rhs)
    )
    assert rres < 1.1e-4


def test_ls_rowcopy_matches_tables(monkeypatch):
    """MGTPU_LS_ROWCOPY: row-structured copy_to/from_mg must be BIT-exact
    vs the element tables on slot-consistent input (the only input class
    the preconditioner ever sees), and the e2e solve must keep iteration
    parity."""
    import dataclasses

    from dealii_multigrid_tpu.mesh import generators as G
    from dealii_multigrid_tpu.solvers.local_smoothing import (
        build_local_smoothing_mg_hybrid,
    )
    from dealii_multigrid_tpu.utils.params import MultigridParameters

    res_u, _, _ = api.run(_params("HMG-local", 4, p=2))
    monkeypatch.setenv("MGTPU_LS_ROWCOPY", "1")
    mesh = G.create("quadrant", 3, 4)
    fine = api.build_level_hybrid(mesh, 2, jnp.float64)
    mg = MultigridParameters()
    mg.coarse_solver.type = "amg"
    lsmg = build_local_smoothing_mg_hybrid(
        fine.dofh, fine.fmt, mg, dtype=jnp.float64
    )
    assert any(lv.rowcopy is not None for lv in lsmg.levels)
    lsmg_tab = dataclasses.replace(
        lsmg,
        levels=tuple(
            dataclasses.replace(lv, rowcopy=None, rowcopy_meta=None)
            for lv in lsmg.levels
        ),
    )
    rng = np.random.default_rng(0)
    rv = jnp.asarray(
        fine.fmt.from_global(rng.standard_normal(fine.dofh.n_dofs))
    )
    np.testing.assert_array_equal(
        np.asarray(lsmg.vmult(rv)), np.asarray(lsmg_tab.vmult(rv))
    )
    res_rc, prob, _ = api.run(_params("HMG-local", 4, p=2))
    assert res_rc.converged
    assert res_rc.n_iterations == res_u.n_iterations
    rres = float(
        jnp.linalg.norm(prob.rhs - prob.op.vmult(res_rc.x))
        / jnp.linalg.norm(prob.rhs)
    )
    assert rres < 1.1e-4


def test_smoothed_aggregation_amg():
    """Native SA-AMG (solvers/amg.py) as a CG preconditioner."""
    import numpy as np
    from dealii_multigrid_tpu.mesh import generators as G
    from dealii_multigrid_tpu.mesh import dof as D
    from dealii_multigrid_tpu.ops import operator as OP
    from dealii_multigrid_tpu.solvers.amg import build_amg
    from dealii_multigrid_tpu.solvers.cg import cg_solve
    from dealii_multigrid_tpu.solvers.coarse import assemble_sparse_matrix

    m = G.create_quadrant(3, 3)
    h = D.distribute_dofs(m, 2)
    c = D.make_hanging_node_constraints(h)
    A = assemble_sparse_matrix(h, c)
    amg = build_amg(A, dtype=jnp.float64, coarse_size=100)
    assert len(amg.levels) >= 2  # genuinely multilevel
    op = OP.make_operator(h, c, dtype=jnp.float64)
    b = jnp.asarray(np.random.default_rng(0).normal(size=h.n_dofs))
    b = b.at[op.constrained].set(0)
    res = cg_solve(op.vmult, b, preconditioner=amg.vmult, reltol=1e-8, maxiter=100)
    assert bool(res.converged) and int(res.n_iterations) < 60


def test_2d_solve_global_engine():
    """dim=2 works through the base engine (the reference templates over dim)."""
    from dealii_multigrid_tpu.mesh import generators as G

    prm = _params("HMG-global", 4, p=2)
    prm.dim = 2
    mesh = G.create("quadrant", 2, 4)
    res, prob, _ = api.solve_with_global_coarsening(prm, mesh)
    assert res.converged and res.n_iterations <= 8


def test_quadrant_flexible_geometry():
    """The reference's default GeometryType (grid_generator.h:69-92)."""
    from dealii_multigrid_tpu.mesh import generators as G

    prm = _params("HMG-global", 2, p=2)
    prm.geometry_type = "quadrant_flexible"
    prm.n_ref_local = 2
    mesh = G.create("quadrant_flexible", 3, 2, 2)
    res, prob, _ = api.solve_with_global_coarsening_hybrid(prm, mesh)
    assert res.converged and res.n_iterations <= 8


def test_cg_solve_host_matches_while_loop():
    """cg_solve_host (one jitted step per iteration — the axon while-loop
    miscompilation workaround, api.mg_solve) is the same algebra as
    cg_solve: identical iterates on an LS-preconditioned solve."""
    from dealii_multigrid_tpu.mesh import generators as G
    from dealii_multigrid_tpu.mesh.dof import (
        distribute_dofs,
        make_hanging_node_constraints,
    )
    from dealii_multigrid_tpu.models import poisson
    from dealii_multigrid_tpu.ops.hybrid import build_hybrid_format
    from dealii_multigrid_tpu.solvers.cg import cg_solve, cg_solve_host
    from dealii_multigrid_tpu.solvers.local_smoothing import (
        build_local_smoothing_mg_hybrid,
    )
    from dealii_multigrid_tpu.utils.params import MultigridParameters
    from dealii_multigrid_tpu import api as A

    mesh = G.create_quadrant(3, 3)
    fine = A.build_level_hybrid(mesh, 2, jnp.float64)
    gop = __import__(
        "dealii_multigrid_tpu.ops.operator", fromlist=["make_operator"]
    ).make_operator(fine.dofh, fine.hanging, dtype=jnp.float64)
    prob = poisson.make_problem(fine.dofh, fine.hanging, gop, "Constant")
    b = jnp.asarray(fine.fmt.from_global(np.asarray(prob.rhs)))
    mg_data = MultigridParameters()
    lsh = build_local_smoothing_mg_hybrid(
        fine.dofh, fine.fmt, mg_data, dtype=jnp.float64
    )
    precond = A.PreconditionLS(lsh, fine.op.constrained_keep, jnp.float64)
    r1 = cg_solve(
        fine.op.vmult, b, preconditioner=precond.vmult,
        maxiter=50, reltol=1e-8, dot=fine.op.dot,
    )
    r2 = cg_solve_host(
        fine.op, b, preconditioner=precond,
        maxiter=50, reltol=1e-8, use_op_dot=True,
    )
    assert int(r1.n_iterations) == int(r2.n_iterations)
    assert bool(r2.converged)
    assert np.allclose(np.asarray(r1.x), np.asarray(r2.x), rtol=1e-12, atol=1e-13)


def test_cg_solve_chain_matches_while_loop():
    """cg_solve_chain (chunked unrolled iterations, one program per chunk —
    the round-4c while_loop fixed-cost fix, api.mg_solve chain=) produces
    identical iterates and iteration counts to cg_solve for every chunking:
    k0 < n_it (leftover single-step dispatches), k0 == n_it (one dispatch),
    and k0 > n_it (past-convergence steps masked out), plus the
    force_iterations parameter-study mode."""
    from dealii_multigrid_tpu.mesh import generators as G
    from dealii_multigrid_tpu.models import poisson
    from dealii_multigrid_tpu.solvers.cg import cg_solve, cg_solve_chain
    from dealii_multigrid_tpu.solvers.local_smoothing import (
        build_local_smoothing_mg_hybrid,
    )
    from dealii_multigrid_tpu.utils.params import MultigridParameters
    from dealii_multigrid_tpu import api as A

    mesh = G.create_quadrant(3, 3)
    fine = A.build_level_hybrid(mesh, 2, jnp.float64)
    gop = __import__(
        "dealii_multigrid_tpu.ops.operator", fromlist=["make_operator"]
    ).make_operator(fine.dofh, fine.hanging, dtype=jnp.float64)
    prob = poisson.make_problem(fine.dofh, fine.hanging, gop, "Constant")
    b = jnp.asarray(fine.fmt.from_global(np.asarray(prob.rhs)))
    mg_data = MultigridParameters()
    lsh = build_local_smoothing_mg_hybrid(
        fine.dofh, fine.fmt, mg_data, dtype=jnp.float64
    )
    precond = A.PreconditionLS(lsh, fine.op.constrained_keep, jnp.float64)
    r1 = cg_solve(
        fine.op.vmult, b, preconditioner=precond.vmult,
        maxiter=50, reltol=1e-8, dot=fine.op.dot,
    )
    n_it = int(r1.n_iterations)
    assert n_it >= 2  # the k0 < n_it case below must exercise leftovers
    for k0 in (1, n_it, n_it + 3):
        r2 = cg_solve_chain(
            fine.op, b, preconditioner=precond,
            maxiter=50, reltol=1e-8, use_op_dot=True, k0=k0,
        )
        assert int(r2.n_iterations) == n_it, k0
        assert bool(r2.converged)
        assert np.allclose(
            np.asarray(r1.x), np.asarray(r2.x), rtol=1e-12, atol=1e-13
        ), k0
    # parameter-study mode: exactly N iterations regardless of tolerance
    rf1 = cg_solve(
        fine.op.vmult, b, preconditioner=precond.vmult,
        force_iterations=4, dot=fine.op.dot,
    )
    rf2 = cg_solve_chain(
        fine.op, b, preconditioner=precond,
        force_iterations=4, use_op_dot=True, k0=3,
    )
    assert int(rf1.n_iterations) == int(rf2.n_iterations) == 4
    assert np.allclose(
        np.asarray(rf1.x), np.asarray(rf2.x), rtol=1e-12, atol=1e-13
    )


def test_gc_chain_env_solve_matches_default():
    """MGTPU_GC_CHAIN=k drives the full GC solve through the chunked-chain
    CG: same iterations and solution as the production while_loop path."""
    from dealii_multigrid_tpu.mesh import generators as G
    import os

    prm = _params("HMG-global", 3, p=2)
    mesh = G.create_quadrant(3, 3)
    res0, _, _ = api.solve_with_global_coarsening_hybrid(prm, mesh)
    old = os.environ.get("MGTPU_GC_CHAIN")
    os.environ["MGTPU_GC_CHAIN"] = "2"
    try:
        res1, _, _ = api.solve_with_global_coarsening_hybrid(prm, mesh)
    finally:
        if old is None:
            del os.environ["MGTPU_GC_CHAIN"]
        else:
            os.environ["MGTPU_GC_CHAIN"] = old
    assert res1.converged and res1.n_iterations == res0.n_iterations
    assert np.allclose(
        np.asarray(res1.x), np.asarray(res0.x), rtol=1e-6, atol=1e-8
    )


def test_ls_chain_env_solve_matches_default():
    """MGTPU_LS_CHAIN=k drives the HMG-local solve through the chunked-chain
    CG (the on-device alternative to the host-loop miscompile workaround —
    the guard raises if the program shape miscompiles): same iterations and
    solution as the default path."""
    from dealii_multigrid_tpu.mesh import generators as G
    import os

    prm = _params("HMG-local", 3, p=2)
    mesh = G.create_quadrant(3, 3)
    res0, _, _ = api.solve_with_local_smoothing_hybrid(prm, mesh)
    old = os.environ.get("MGTPU_LS_CHAIN")
    os.environ["MGTPU_LS_CHAIN"] = "2"
    try:
        res1, _, _ = api.solve_with_local_smoothing_hybrid(prm, mesh)
    finally:
        if old is None:
            del os.environ["MGTPU_LS_CHAIN"]
        else:
            os.environ["MGTPU_LS_CHAIN"] = old
    assert res1.converged and res1.n_iterations == res0.n_iterations
    assert np.allclose(
        np.asarray(res1.x), np.asarray(res0.x), rtol=1e-6, atol=1e-8
    )


def test_eig_host_loop_matches_batched():
    """estimate_eigenvalue_ranges host-loop mode (one jitted CG step per
    iteration — the remote-compile workaround) reproduces the one-program
    scan results."""
    from dealii_multigrid_tpu.mesh import generators as G
    from dealii_multigrid_tpu.mesh.coarsening import geometric_coarsening_sequence
    from dealii_multigrid_tpu.solvers.chebyshev import estimate_eigenvalue_ranges
    from dealii_multigrid_tpu import api as A

    mesh = G.create_quadrant(3, 3)
    plan = A.gc_level_plan("HMG-global", geometric_coarsening_sequence(mesh), 2)
    levels = [A.build_level_hybrid(m, d, jnp.float64) for m, d in plan]
    ops = [lv.op for lv in levels[1:]]
    invd = [lv.inv_diag for lv in levels[1:]]
    b0s = [lv.eig_b0 for lv in levels[1:]]
    r1 = estimate_eigenvalue_ranges(ops, invd, b0s, use_op_dot=True, host_loop=False)
    r2 = estimate_eigenvalue_ranges(ops, invd, b0s, use_op_dot=True, host_loop=True)
    for (a1, b1), (a2, b2) in zip(r1, r2):
        assert abs(a1 - a2) < 1e-9 * max(abs(a1), 1.0)
        assert abs(b1 - b2) < 1e-9 * max(abs(b1), 1.0)


def test_eig_extrapolation_is_per_degree():
    """Fine-level lam_max extrapolation must use only computed levels of the
    SAME polynomial degree (ADVICE r3: lam_max(D^-1 A) varies with p, so a
    p=1-derived value must not be assigned to an excluded p=4 level)."""
    from dealii_multigrid_tpu.mesh import generators as G
    from dealii_multigrid_tpu import api as A
    from dealii_multigrid_tpu.solvers.chebyshev import (
        estimate_eigenvalue_ranges,
    )

    mesh = G.create("hypercube", 3, 2, 0)
    lv_p1 = A.build_level_hybrid(mesh, 1, jnp.float64)
    lv_p2 = A.build_level_hybrid(mesh, 2, jnp.float64)
    lv_p4 = A.build_level_hybrid(mesh, 4, jnp.float64)
    levels = [lv_p1, lv_p2, lv_p4]
    ops = [lv.op for lv in levels]
    invd = [lv.inv_diag for lv in levels]
    b0s = [lv.eig_b0 for lv in levels]
    degrees = [1, 2, 4]
    exact = estimate_eigenvalue_ranges(ops, invd, b0s, use_op_dot=True)
    # exclude the p=4 level by size: with degree info it must still get a
    # p=4-derived estimate (a computed representative), not 1.05x the p<=2 max
    thresh = int(invd[2].shape[0]) - 1
    est = estimate_eigenvalue_ranges(
        ops, invd, b0s, use_op_dot=True,
        extrapolate_above=thresh, degrees=degrees,
    )
    assert abs(est[2][0] - exact[2][0]) < 1e-9 * exact[2][0]
    # without degree info the old global extrapolation would underestimate
    est_nodeg = estimate_eigenvalue_ranges(
        ops, invd, b0s, use_op_dot=True, extrapolate_above=thresh,
    )
    assert est_nodeg[2][0] < exact[2][0]  # documents the hazard fixed above


@pytest.mark.parametrize(
    "typ", ["PMG", "HPMG", "HMG-local", "HPMG-local", "HMG-global"]
)
def test_all_types_under_production_flags(typ, monkeypatch):
    """Every solver variant solves correctly with the FULL TPU production
    pipeline forced on (DEFAULT_POLICY engages it on any non-CPU
    platform; ineligible levels — p-transfers, tiny patches — must fall
    back gracefully, never crash or change convergence)."""
    # pin the SHIPPED policy values (not hand-copies that can drift —
    # round-4 verdict weak #3: this test pinned LS_CHAIN=4 vs shipped 3);
    # shape-conditional values are forced on so the paths engage at CI size
    from dealii_multigrid_tpu.utils import flags

    flags.pin_policy_env(monkeypatch.setenv)
    res, prob, _ = api.run(_params(typ, 3, p=3))
    assert res.converged
    assert res.n_iterations <= 8
    rres = float(
        jnp.linalg.norm(prob.rhs - prob.op.vmult(res.x))
        / jnp.linalg.norm(prob.rhs)
    )
    assert rres < 1.1e-4


def test_annulus_under_production_flags(monkeypatch):
    """Annulus (the richest hanging-node structure of the five geometries)
    under the full production pipeline — insurance for the TPU sweep
    families, which run every geometry with DEFAULT_POLICY flags on."""
    from dealii_multigrid_tpu.utils import flags

    flags.pin_policy_env(monkeypatch.setenv)
    prm = _params("HMG-global", 2, p=3)
    prm.geometry_type = "annulus"
    res, prob, _ = api.run(prm)
    assert res.converged
    rres = float(
        jnp.linalg.norm(prob.rhs - prob.op.vmult(res.x))
        / jnp.linalg.norm(prob.rhs)
    )
    assert rres < 1.1e-4
