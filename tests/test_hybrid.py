"""Hybrid patch-structured engine tests: exact equivalence with the global
gather engine (operators, transfers, full solves)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from dealii_multigrid_tpu import api
from dealii_multigrid_tpu.mesh import generators as G, dof as D
from dealii_multigrid_tpu.mesh.coarsening import geometric_coarsening_sequence
from dealii_multigrid_tpu.ops import operator as OP, hybrid as H, transfer as T
from dealii_multigrid_tpu.ops import hybrid_transfer as HT
from dealii_multigrid_tpu.utils.params import RunParameters


def test_neighbour_lookup_matches_dict():
    """_neighbour_lookup (packed-key searchsorted) reproduces the dict
    semantics it replaced: same-level face neighbour index or -1."""
    mesh = G.create("quadrant", 3, 4, 0)
    lvl = np.asarray(mesh.level)
    crd = np.asarray(mesh.anchor)
    got = H._neighbour_lookup(lvl, crd)
    key = {
        (int(lvl[i]), int(crd[i, 0]), int(crd[i, 1]), int(crd[i, 2])): i
        for i in range(len(lvl))
    }
    for d in range(3):
        for side, row in ((0, 2 * d), (1, 2 * d + 1)):
            for i in range(len(lvl)):
                q = [int(lvl[i]), int(crd[i, 0]), int(crd[i, 1]),
                     int(crd[i, 2])]
                q[d + 1] += 1 if side else -1
                assert got[row, i] == key.get(tuple(q), -1)


def _build(mesh, p):
    dofh = D.distribute_dofs(mesh, p)
    hang = D.make_hanging_node_constraints(dofh)
    gop = OP.make_operator(dofh, hang, dtype=jnp.float64)
    fmt = H.build_hybrid_format(dofh, K=4)
    hop = H.make_hybrid_operator(fmt, hang, dtype=jnp.float64)
    return dofh, hang, gop, fmt, hop


@pytest.mark.parametrize(
    "geo,r,p",
    [
        ("hypercube", 2, 2),
        ("quadrant", 3, 2),
        ("quadrant", 4, 3),
        # shell geometries: different refinement-transition surfaces than the
        # graded-corner quadrant (VERDICT r2 weak #6) — dispatch_solve routes
        # ALL 3D solves through the hybrid engine, so equivalence must hold
        ("annulus", 5, 2),
        ("circle", 5, 2),
    ],
)
def test_hybrid_vmult_matches_global(geo, r, p):
    m = G.create(geo, 3, r)
    dofh, hang, gop, fmt, hop = _build(m, p)
    u = np.random.default_rng(0).normal(size=dofh.n_dofs)
    x = jnp.asarray(fmt.from_global(u))
    rg = np.asarray(jax.jit(gop.vmult)(jnp.asarray(u)))
    rh = np.asarray(jax.jit(hop.vmult)(x))
    # every slot of a dof must hold the global value (consistency + equality)
    assert np.abs(rh - rg[fmt.slot_dof]).max() < 1e-10


def test_hybrid_dot_matches_global():
    m = G.create_quadrant(3, 3)
    dofh, hang, gop, fmt, hop = _build(m, 2)
    rng = np.random.default_rng(1)
    u, v = rng.normal(size=(2, dofh.n_dofs))
    d_h = float(hop.dot(jnp.asarray(fmt.from_global(u)), jnp.asarray(fmt.from_global(v))))
    assert abs(d_h - float(u @ v)) < 1e-9 * abs(float(u @ v))


@pytest.mark.parametrize("kind", ["h", "p"])
def test_hybrid_transfer_matches_global(kind):
    m = G.create_quadrant(3, 4)
    if kind == "h":
        seq = geometric_coarsening_sequence(m)
        fine_m, coarse_m, pf, pc = seq[-1], seq[-2], 2, 2
    else:
        fine_m, coarse_m, pf, pc = m, m, 2, 1
    fdofh, fhang, fgop, ffmt, fhop = _build(fine_m, pf)
    cdofh, chang, cgop, cfmt, chop = _build(coarse_m, pc)
    gt = T.make_two_level_transfer(fdofh, cdofh, fgop, cgop, dtype=jnp.float64)
    ht = HT.make_hybrid_transfer(ffmt, cfmt, fhop, chop, dtype=jnp.float64)
    rng = np.random.default_rng(2)
    uc = rng.normal(size=cdofh.n_dofs)
    pg = np.asarray(jax.jit(gt.prolong)(jnp.asarray(uc)))
    ph = np.asarray(jax.jit(ht.prolong)(jnp.asarray(cfmt.from_global(uc))))
    assert np.abs(ph - pg[ffmt.slot_dof]).max() < 1e-10
    rf = rng.normal(size=fdofh.n_dofs)
    rg = np.asarray(jax.jit(gt.restrict)(jnp.asarray(rf)))
    rh = np.asarray(jax.jit(ht.restrict)(jnp.asarray(ffmt.from_global(rf))))
    assert np.abs(rh - rg[cfmt.slot_dof]).max() < 1e-9 * max(np.abs(rg).max(), 1)


def test_hybrid_solve_matches_global_engine():
    prm = RunParameters()
    prm.type = "HMG-global"
    prm.geometry_type = "quadrant"
    prm.n_ref_global = 3
    prm.fe_degree_fine = 2
    prm.number_type = "double"
    prm.mg_number_type = "double"
    prm.mg_data.coarse_solver.type = "amg"
    prm.mg_data.smoother.degree = 3
    prm.mg_data.n_repetitions = 1
    mesh = G.create("quadrant", 3, 3)
    res_h, _, _ = api.solve_with_global_coarsening_hybrid(prm, mesh)
    res_g, _, _ = api.solve_with_global_coarsening(prm, mesh)
    assert res_h.converged and res_g.converged
    assert abs(res_h.n_iterations - res_g.n_iterations) <= 1
    dx = np.abs(np.asarray(res_h.x) - np.asarray(res_g.x)).max()
    assert dx < 1e-4 * np.abs(np.asarray(res_g.x)).max()


def test_sanitizer_format_verification(monkeypatch):
    """MGTPU_DEBUG=1 makes format-invariant checks routine (every level
    build, not just the dryrun) and catches a broken owner mask."""
    monkeypatch.setenv("MGTPU_DEBUG", "1")
    assert H.sanitizer_enabled()
    m = G.create("quadrant", 3, 3)
    lv = api.build_level_hybrid(m, 2, jnp.float32)  # runs verify_format
    H.verify_format(lv.fmt)
    import dataclasses

    bad = dataclasses.replace(lv.fmt, owner=np.zeros_like(lv.fmt.owner))
    with pytest.raises(AssertionError, match="owner mask"):
        H.verify_format(bad)
    monkeypatch.setenv("MGTPU_DEBUG", "0")
    assert not H.sanitizer_enabled()


def _build_k(mesh, p, K):
    dofh = D.distribute_dofs(mesh, p)
    hang = D.make_hanging_node_constraints(dofh)
    fmt = H.build_hybrid_format(dofh, K=K)
    hop = H.make_hybrid_operator(fmt, hang, dtype=jnp.float64)
    return dofh, hang, fmt, hop


@pytest.mark.parametrize("variants", [False, True])
def test_hybrid_transfer_cross_k_matches_global(variants, monkeypatch):
    """Adaptive per-level patch granularity: h-transfer with K_coarse =
    K_fine/2 (the id_oct octant-identity + whole-patch-parent buckets) must
    reproduce the global gather-engine transfer exactly, in both the plain
    and the transposed/tv engine paths."""
    if variants:
        monkeypatch.setenv("MGTPU_TTRANSFER", "1")
        monkeypatch.setenv("MGTPU_TV", "1")
        monkeypatch.setenv("MGTPU_TSTENCIL", "1")
        monkeypatch.setenv("MGTPU_ROW_SINGLE", "1")
        monkeypatch.setenv("MGTPU_TEXCHANGE", "1")
    # one octant refined on a uniform cube: 7 level-3 4^3 blocks stay
    # IDENTITY under coarsening (id_oct octants) and the refined corner's 8
    # level-4 blocks take the whole-coarse-patch parent path
    m = G.create_quadrant_flexible(3, 3, 1)
    seq = geometric_coarsening_sequence(m)
    fine_m, coarse_m, p = seq[-1], seq[-2], 2
    fdofh, fhang, ffmt, fhop = _build_k(fine_m, p, 4)
    cdofh, chang, cfmt, chop = _build_k(coarse_m, p, 2)
    assert ffmt.K == 4 and cfmt.K == 2
    fgop = OP.make_operator(fdofh, fhang, dtype=jnp.float64)
    cgop = OP.make_operator(cdofh, chang, dtype=jnp.float64)
    gt = T.make_two_level_transfer(fdofh, cdofh, fgop, cgop, dtype=jnp.float64)
    ht = HT.make_hybrid_transfer(ffmt, cfmt, fhop, chop, dtype=jnp.float64)
    # the cross-K buckets must actually engage (not the irregular fallback)
    assert ht.id_oct, "expected id_oct octant buckets"
    assert ht.patch_buckets, "expected half-K parent bucket"
    assert ht.irr_id is None and ht.irr_patch is None
    rng = np.random.default_rng(3)
    uc = rng.normal(size=cdofh.n_dofs)
    pg = np.asarray(jax.jit(gt.prolong)(jnp.asarray(uc)))
    ph = np.asarray(jax.jit(ht.prolong)(jnp.asarray(cfmt.from_global(uc))))
    assert np.abs(ph - pg[ffmt.slot_dof]).max() < 1e-10
    rf = rng.normal(size=fdofh.n_dofs)
    rg = np.asarray(jax.jit(gt.restrict)(jnp.asarray(rf)))
    rh = np.asarray(jax.jit(ht.restrict)(jnp.asarray(ffmt.from_global(rf))))
    assert np.abs(rh - rg[cfmt.slot_dof]).max() < 1e-9 * max(np.abs(rg).max(), 1)


def test_kadapt_solve_matches_uniform_k(monkeypatch):
    """MGTPU_KADAPT end-to-end: the adaptive-K solve must converge to the
    same solution with the same iteration count as the uniform-K=8 solve."""
    prm = RunParameters()
    prm.type = "HMG-global"
    prm.geometry_type = "quadrant"
    prm.n_ref_global = 4
    prm.fe_degree_fine = 2
    prm.number_type = "double"
    prm.mg_number_type = "double"
    prm.mg_data.coarse_solver.type = "amg"
    prm.mg_data.smoother.degree = 3
    prm.mg_data.n_repetitions = 1
    mesh = G.create("quadrant", 3, 4)
    res_u, _, _ = api.solve_with_global_coarsening_hybrid(prm, mesh)
    monkeypatch.setenv("MGTPU_KADAPT", "8")  # tiny target: triggers halving
    from dealii_multigrid_tpu.api import choose_level_ks, gc_level_plan
    from dealii_multigrid_tpu.mesh.coarsening import (
        geometric_coarsening_sequence as gcs,
    )
    ks = choose_level_ks(gc_level_plan("HMG-global", gcs(mesh), 2))
    assert any(k < 8 for k in ks), f"adaptive K never halved: {ks}"
    res_a, _, _ = api.solve_with_global_coarsening_hybrid(prm, mesh)
    assert res_a.converged and res_u.converged
    assert res_a.n_iterations == res_u.n_iterations
    dx = np.abs(np.asarray(res_a.x) - np.asarray(res_u.x)).max()
    assert dx < 1e-8 * max(np.abs(np.asarray(res_u.x)).max(), 1)
