"""Lane-dense operator variants == baseline, exactly (same linear operator).

The tile-padding diagnosis (RESULTS.md round-3c) introduced two flagged
variants of the hybrid engine's hot paths:
  * use_tstencil — patch-minor [S, S, S, NP] transpose-sandwich stencil
  * use_row_single — whole-row [NS, nloc] singleton sweeps + cross exchange
Both must be the SAME operator as the baseline up to f.p. summation order.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from dealii_multigrid_tpu import api
from dealii_multigrid_tpu.mesh import generators
from dealii_multigrid_tpu.mesh.coarsening import geometric_coarsening_sequence


def _levels(geom, r, p, dtype):
    mesh = generators.create(geom, 3, r, 0)
    tri_seq = geometric_coarsening_sequence(mesh)
    plan = api.gc_level_plan("HMG-global", tri_seq, p)
    return [api.build_level_hybrid(m, d, dtype) for m, d in plan]


@pytest.mark.parametrize(
    "geom,r,p,expect_cross",
    [("quadrant", 4, 2, False), ("annulus", 4, 2, False),
     ("quadrant", 5, 3, True)],
)
def test_variants_match_baseline(geom, r, p, expect_cross):
    levels = _levels(geom, r, p, jnp.float64)
    rng = np.random.default_rng(7)
    checked_cross = checked_ssweep = False
    for lv in levels:
        op = lv.op
        if not op.NS:
            continue
        x = jnp.asarray(rng.standard_normal(op.n_slots), jnp.float64)
        base = np.asarray(op.vmult(x))
        scale = np.abs(base).max()
        r_in = jnp.asarray(rng.standard_normal(op.n_slots), jnp.float64)
        exch = np.asarray(op.exchange(r_in))
        var = dataclasses.replace(op, use_row_single=True, use_tstencil=True)
        vart = dataclasses.replace(var, use_texchange=True)
        for v in (var, vart):
            np.testing.assert_allclose(
                np.asarray(v.vmult(x)), base, rtol=0, atol=1e-12 * scale
            )
            np.testing.assert_allclose(
                np.asarray(v.exchange(r_in)), exch, rtol=0, atol=1e-12 * scale
            )
        checked_cross |= bool(op.use_cross)
        checked_ssweep |= bool(op.NS and op.use_ssweep and not op.use_cross)
    if expect_cross:
        assert checked_cross, "no level exercised the cross-exchange path"


@pytest.mark.parametrize("geom,r,p", [("quadrant", 4, 2), ("quadrant", 5, 3)])
def test_ttransfer_matches_baseline(geom, r, p):
    from dealii_multigrid_tpu.ops.hybrid_transfer import make_hybrid_transfer

    levels = _levels(geom, r, p, jnp.float64)
    rng = np.random.default_rng(11)
    hit = False
    for lc, lf in zip(levels[:-1], levels[1:]):
        tr = make_hybrid_transfer(lf.fmt, lc.fmt, lf.op, lc.op, jnp.float64)
        if not tr.patch_hot:
            continue
        trt = dataclasses.replace(tr, use_ttransfer=True)
        uc = jnp.asarray(rng.standard_normal(lc.op.n_slots), jnp.float64)
        rf = jnp.asarray(rng.standard_normal(lf.op.n_slots), jnp.float64)
        a_p, b_p = np.asarray(tr.prolong(uc)), np.asarray(trt.prolong(uc))
        np.testing.assert_allclose(b_p, a_p, rtol=0,
                                   atol=1e-12 * max(np.abs(a_p).max(), 1))
        a_r, b_r = np.asarray(tr.restrict(rf)), np.asarray(trt.restrict(rf))
        np.testing.assert_allclose(b_r, a_r, rtol=0,
                                   atol=1e-12 * max(np.abs(a_r).max(), 1))
        hit = True
    assert hit, "no transfer with patch buckets exercised"


@pytest.mark.parametrize("geom,r,p", [("quadrant", 4, 2), ("quadrant", 5, 3)])
def test_banded_lane_routing_matches_full(geom, r, p, monkeypatch):
    """MGTPU_HOT_BOUND=1 forces the BANDED per-tile one-hot routing (the
    NP >> 128 path that re-enables t-transfers at r=8/p=4, where the full
    [NP_c, NP_f] matrices blow the 4M budget).  Banded must be bit-exact
    vs the full routing in both directions, and must actually engage."""
    from dealii_multigrid_tpu.ops.hybrid_transfer import make_hybrid_transfer

    levels = _levels(geom, r, p, jnp.float64)
    rng = np.random.default_rng(12)
    hit = False
    for lc, lf in zip(levels[:-1], levels[1:]):
        tr = make_hybrid_transfer(lf.fmt, lc.fmt, lf.op, lc.op, jnp.float64)
        if not (tr.patch_hot or tr.id_oct):
            continue
        monkeypatch.setenv("MGTPU_HOT_BOUND", "1")
        trb = make_hybrid_transfer(lf.fmt, lc.fmt, lf.op, lc.op, jnp.float64)
        monkeypatch.delenv("MGTPU_HOT_BOUND")
        if tr.patch_hot:
            assert trb.patch_hot_starts and trb.patch_hot_starts[0] is not None
        tr = dataclasses.replace(tr, use_ttransfer=True)
        trb = dataclasses.replace(trb, use_ttransfer=True)
        uc = jnp.asarray(rng.standard_normal(lc.op.n_slots), jnp.float64)
        rf = jnp.asarray(rng.standard_normal(lf.op.n_slots), jnp.float64)
        a_p, b_p = np.asarray(tr.prolong(uc)), np.asarray(trb.prolong(uc))
        np.testing.assert_allclose(b_p, a_p, rtol=0,
                                   atol=1e-12 * max(np.abs(a_p).max(), 1))
        a_r, b_r = np.asarray(tr.restrict(rf)), np.asarray(trb.restrict(rf))
        np.testing.assert_allclose(b_r, a_r, rtol=0,
                                   atol=1e-12 * max(np.abs(a_r).max(), 1))
        hit = True
    assert hit, "no transfer with routing matrices exercised"


def test_row_ssweep_matches_lattice_path():
    # force the non-cross branch to compare _ssweep_rows against the
    # lattice sweeps on a level that has singleton neighbours
    levels = _levels("quadrant", 4, 2, jnp.float64)
    rng = np.random.default_rng(3)
    hit = False
    for lv in levels:
        op = lv.op
        if not (op.NS and op.use_ssweep):
            continue
        base = dataclasses.replace(op, use_cross=False)
        var = dataclasses.replace(op, use_cross=False, use_row_single=True)
        vart = dataclasses.replace(var, use_texchange=True)
        r_in = jnp.asarray(rng.standard_normal(op.n_slots), jnp.float64)
        a = np.asarray(base.exchange(r_in))
        for v in (var, vart):
            b = np.asarray(v.exchange(r_in))
            np.testing.assert_allclose(b, a, rtol=0, atol=1e-12 * np.abs(a).max())
        hit = True
    assert hit


@pytest.mark.parametrize(
    "geom,r,p,expect_cross",
    [("quadrant", 4, 2, False), ("annulus", 4, 2, False),
     ("quadrant", 5, 3, True)],
)
def test_tv_vmult_matches_baseline(geom, r, p, expect_cross, monkeypatch):
    # transposed-vmult mode: ONE entry/exit transpose, permuted tables,
    # merged scatter rounds — must be the SAME operator as the baseline up
    # to f.p. summation order.  tv tables are built at operator-build time
    # (MGTPU_TV), and replace(op, tv=None) recovers the baseline path on the
    # very same build.
    monkeypatch.setenv("MGTPU_TV", "1")
    levels = _levels(geom, r, p, jnp.float64)
    rng = np.random.default_rng(13)
    checked_cross = checked = False
    for lv in levels:
        op = lv.op
        if op.tv is None:
            continue
        base_op = dataclasses.replace(op, tv=None)
        x = jnp.asarray(rng.standard_normal(op.n_slots), jnp.float64)
        base = np.asarray(base_op.vmult(x))
        scale = max(np.abs(base).max(), 1.0)
        np.testing.assert_allclose(
            np.asarray(op.vmult(x)), base, rtol=0, atol=1e-12 * scale
        )
        # round-trip of the layout permutation is exact
        np.testing.assert_array_equal(
            np.asarray(op._from_t(op._to_t(x))), np.asarray(x)
        )
        checked = True
        checked_cross |= bool(op.use_cross)
    assert checked, "no level built tv tables"
    if expect_cross:
        assert checked_cross, "no tv level exercised the cross-exchange path"


def test_tgemm_boundary_transposes_exact(monkeypatch):
    # MGTPU_TGEMM: the tv boundary transposes as one-hot [NP, NP] GEMMs.
    # A one-hot product is a single 1.0*x per output element, so the GEMM
    # path must be BIT-exact vs the XLA-transpose path (f32 vectors; the
    # f64 build keeps eye staged but the f32-only gate skips it).
    monkeypatch.setenv("MGTPU_TV", "1")
    monkeypatch.setenv("MGTPU_TGEMM", "1")
    levels = _levels("quadrant", 5, 3, jnp.float32)
    rng = np.random.default_rng(7)
    checked = False
    for lv in levels:
        op = lv.op
        if op.tv is None or not op.NP:
            continue
        assert "eye" in op.tv
        plain = dataclasses.replace(
            op, tv={k: v for k, v in op.tv.items() if k != "eye"}
        )
        x = jnp.asarray(rng.standard_normal(op.n_slots), jnp.float32)
        np.testing.assert_array_equal(
            np.asarray(op._to_t(x)), np.asarray(plain._to_t(x))
        )
        xt = plain._to_t(x)
        np.testing.assert_array_equal(
            np.asarray(op._from_t(xt)), np.asarray(plain._from_t(xt))
        )
        # f64 input must fall back to the transpose path (no f32 eye GEMM)
        x64 = x.astype(jnp.float64)
        np.testing.assert_array_equal(
            np.asarray(op._to_t(x64)), np.asarray(plain._to_t(x64))
        )
        checked = True
    assert checked, "no tv level with patches built under MGTPU_TGEMM"


def test_tcfaces_dense_planes_match_flat(monkeypatch):
    # MGTPU_TCFACES: structured patch faces applied as dense (d, side)
    # T-lattice slab blends with one-hot patch routing.  Must equal the
    # flat-table tv path exactly (one-hot routing = pure selection; the
    # same einsum products land in the same slots).
    monkeypatch.setenv("MGTPU_TV", "1")
    monkeypatch.setenv("MGTPU_TCFACES", "1")
    levels = _levels("quadrant", 5, 3, jnp.float64)
    rng = np.random.default_rng(11)
    checked = False
    for lv in levels:
        op = lv.op
        if op.tv is None or not op.NP:
            continue
        if not any(
            g is not None for g in op.tv.get("sfp_dense", (None,))
        ):
            continue
        plain = dataclasses.replace(
            op, tv={k: v for k, v in op.tv.items() if k != "sfp_dense"}
        )
        x = jnp.asarray(rng.standard_normal(op.n_slots), jnp.float64)
        a = np.asarray(plain.vmult(x))
        b = np.asarray(op.vmult(x))
        scale = max(np.abs(a).max(), 1.0)
        np.testing.assert_allclose(b, a, rtol=0, atol=1e-12 * scale)
        # stage-level: apply_c_t and ct_faces_t individually
        xt = op._to_t(x)
        np.testing.assert_allclose(
            np.asarray(op._apply_c_t(xt)),
            np.asarray(plain._apply_c_t(xt)),
            rtol=0, atol=1e-12 * scale,
        )
        np.testing.assert_allclose(
            np.asarray(op._ct_faces_t(xt)),
            np.asarray(plain._ct_faces_t(xt)),
            rtol=0, atol=1e-12 * scale,
        )
        checked = True
    assert checked, "no tv level carried structured patch faces"


@pytest.mark.parametrize(
    "geom,r,p", [("quadrant", 4, 2), ("quadrant", 5, 3), ("annulus", 4, 2)]
)
def test_tsplit_pipeline_matches_flat_tv(geom, r, p, monkeypatch):
    # MGTPU_TSPLIT: the split-state (TVec) pipeline — patch head and
    # singleton tail carried as separate leaves, host-split scatter tables.
    # Must equal the flat tv path exactly: the same gathers/GEMMs run, only
    # the scatter TARGETS move to the bucket they live in (per-slot
    # duplicate groups never span buckets, so set-order is preserved).
    monkeypatch.setenv("MGTPU_TV", "1")
    monkeypatch.setenv("MGTPU_TCFACES", "1")
    monkeypatch.setenv("MGTPU_TSPLIT", "1")
    levels = _levels(geom, r, p, jnp.float64)
    rng = np.random.default_rng(17)
    checked = False
    for lv in levels:
        op = lv.op
        if op.tv is None:
            continue
        assert "split" in op.tv
        flat = dataclasses.replace(
            op, tv={k: v for k, v in op.tv.items() if k != "split"}
        )
        x = jnp.asarray(rng.standard_normal(op.n_slots), jnp.float64)
        a = np.asarray(flat.vmult(x))
        b = np.asarray(op.vmult(x))
        scale = max(np.abs(a).max(), 1.0)
        np.testing.assert_allclose(b, a, rtol=0, atol=1e-12 * scale)
        # layout round-trip is exact
        np.testing.assert_array_equal(
            np.asarray(op._from_ts(op._to_ts(x))), np.asarray(x)
        )
        # stage-level equality vs the flat-T stages
        xt = flat._to_t(x)
        xs = op._to_ts(x)
        for f_t, f_ts in (
            (flat._apply_c_t, op._apply_c_ts),
            (flat._ct_faces_t, op._ct_faces_ts),
            (flat._exchange_t, op._exchange_ts),
            (flat._apply_ct_t, op._apply_ct_ts),
            (flat._vmult_t_core, op._vmult_ts_core),
        ):
            ref = np.asarray(f_t(xt))
            got = np.asarray(op._from_ts(f_ts(xs)))
            ref_flat = np.asarray(flat._from_t(ref))
            np.testing.assert_allclose(
                got, ref_flat, rtol=0, atol=1e-12 * scale
            )
        checked = True
    assert checked, "no level built split tables"


@pytest.mark.parametrize(
    "geom,r,p", [("quadrant", 4, 2), ("quadrant", 5, 3), ("annulus", 4, 2)]
)
def test_rowsf_matches_element_tables(geom, r, p, monkeypatch):
    # MGTPU_ROWSF: singleton structured faces as block-row gathers +
    # one-hot plane-selection GEMMs (split pipeline).  On slot-CONSISTENT
    # input (the invariant class apply_c sees in production — duplicate
    # face writes carry equal values there) the designated-writer dedup is
    # exact; the ct side only reorders commuting adds.
    monkeypatch.setenv("MGTPU_TV", "1")
    monkeypatch.setenv("MGTPU_TCFACES", "1")
    monkeypatch.setenv("MGTPU_TSPLIT", "1")
    monkeypatch.setenv("MGTPU_ROWSF", "1")
    levels = _levels(geom, r, p, jnp.float64)
    rng = np.random.default_rng(29)
    checked = False
    for lv in levels:
        op = lv.op
        if op.tv is None or "rowsf_c" not in op.tv.get("split", {}):
            continue
        sp = op.tv["split"]
        noro = dataclasses.replace(
            op, tv={
                **op.tv,
                "split": {
                    k: v for k, v in sp.items()
                    if not k.startswith("rowsf") and k != "sfs_ro"
                },
            }
        )
        u = rng.standard_normal(lv.fmt.dofh.n_dofs)
        x = jnp.asarray(lv.fmt.from_global(u), jnp.float64)
        a = np.asarray(noro.vmult(x))
        b = np.asarray(op.vmult(x))
        scale = max(np.abs(a).max(), 1.0)
        np.testing.assert_allclose(b, a, rtol=0, atol=1e-12 * scale)
        # ct stage alone on an arbitrary (residual-type) vector: adds
        # commute, so raw input is fine there
        xr = jnp.asarray(rng.standard_normal(op.n_slots), jnp.float64)
        xs = op._to_ts(xr)
        ref = np.asarray(noro._from_ts(noro._ct_faces_ts(xs)))
        got = np.asarray(op._from_ts(op._ct_faces_ts(xs)))
        np.testing.assert_allclose(got, ref, rtol=0,
                                   atol=1e-12 * max(np.abs(ref).max(), 1.0))
        checked = True
    if geom == "annulus" and not checked:
        pytest.skip("no tail-resident singleton-face level on this mesh")
    assert checked, "no level built rowsf tables"


def test_tsplit_smoother_recurrence(monkeypatch):
    # the Chebyshev recurrence on split (TVec) state must match the flat-T
    # recurrence: same polynomial, different state carrier.
    from dealii_multigrid_tpu.solvers.chebyshev import ChebyshevSmoother

    monkeypatch.setenv("MGTPU_TV", "1")
    monkeypatch.setenv("MGTPU_TSPLIT", "1")
    levels = _levels("quadrant", 4, 2, jnp.float64)
    rng = np.random.default_rng(23)
    checked = False
    for lv in levels:
        op = lv.op
        if op.tv is None or "split" not in op.tv:
            continue
        inv_diag = jnp.asarray(np.asarray(lv.inv_diag), jnp.float64)
        sm = ChebyshevSmoother.create(
            op, inv_diag, degree=3, max_eigenvalue=2.0
        )
        flat_op = dataclasses.replace(
            op, tv={k: v for k, v in op.tv.items() if k != "split"}
        )
        sm_flat = ChebyshevSmoother.create(
            flat_op, inv_diag, degree=3, max_eigenvalue=2.0
        )
        b = jnp.asarray(rng.standard_normal(op.n_slots), jnp.float64)
        x0 = jnp.asarray(rng.standard_normal(op.n_slots), jnp.float64)
        for f, g in ((sm.vmult, sm_flat.vmult),
                     (lambda v: sm.step(x0, v), lambda v: sm_flat.step(x0, v))):
            a = np.asarray(g(b))
            c = np.asarray(f(b))
            scale = max(np.abs(a).max(), 1.0)
            np.testing.assert_allclose(c, a, rtol=0, atol=1e-12 * scale)
        checked = True
    assert checked, "no split level exercised the smoother"


def test_tvcycle_state_matches_flat(monkeypatch):
    # MGTPU_TVCYCLE: level visits in split (TVec) state — one to/from_ts
    # pair per visit.  Must equal the flat V-cycle exactly (same stage
    # algebra; only the boundary transposes move).
    import dataclasses as dc

    from dealii_multigrid_tpu.solvers.multigrid import PreconditionMG
    from dealii_multigrid_tpu.utils.params import MultigridParameters

    monkeypatch.setenv("MGTPU_TV", "1")
    monkeypatch.setenv("MGTPU_TCFACES", "1")
    monkeypatch.setenv("MGTPU_TSPLIT", "1")
    monkeypatch.setenv("MGTPU_ROWSF", "1")
    monkeypatch.setenv("MGTPU_TTRANSFER", "1")
    monkeypatch.setenv("MGTPU_KADAPT", "256")
    monkeypatch.setenv("MGTPU_TVCYCLE", "1")
    mesh = generators.create("quadrant", 3, 4, 0)
    plan = api.gc_level_plan(
        "HMG-global", geometric_coarsening_sequence(mesh), 3
    )
    ks = api.choose_level_ks(plan)
    levels = [
        api.build_level_hybrid(m, d, jnp.float64, K=kk)
        for (m, d), kk in zip(plan, ks)
    ]
    mg_data = MultigridParameters()
    mg_data.smoother.degree = 3
    mg_data.coarse_solver.type = "amg"
    mg = api.build_gc_preconditioner_hybrid(levels, mg_data, jnp.float64)
    assert mg.use_state
    assert any(mg._level_state_ok(l) for l in range(1, mg.n_levels))
    mg_flat = dc.replace(mg, use_state=False)
    rng = np.random.default_rng(31)
    b = jnp.asarray(rng.standard_normal(levels[-1].op.n_slots), jnp.float64)
    a = np.asarray(mg_flat.vmult(b))
    c = np.asarray(mg.vmult(b))
    scale = max(np.abs(a).max(), 1.0)
    np.testing.assert_allclose(c, a, rtol=0, atol=1e-12 * scale)


def test_scatter_rounds_cover_all_levels():
    # the build-time dependency grouping must partition the sf level list
    levels = _levels("quadrant", 5, 3, jnp.float64)
    for lv in levels:
        op = lv.op
        if not op.sf_levels:
            continue
        n = len(op.sf_levels)
        flat_c = [i for rnd in op.sf_c_rounds for i in rnd]
        flat_ct = [i for rnd in op.sf_ct_rounds for i in rnd]
        assert sorted(flat_c) == list(range(n))
        assert sorted(flat_ct) == list(range(n))
        assert flat_c == sorted(flat_c), "apply_c rounds must ascend"
        assert flat_ct == sorted(flat_ct, reverse=True), (
            "ct_faces rounds must descend"
        )


def test_variant_flag_grammar(monkeypatch):
    from dealii_multigrid_tpu.utils.flags import variant_flag

    monkeypatch.delenv("MGTPU_X", raising=False)
    assert variant_flag("MGTPU_X", np=512) is False
    monkeypatch.setenv("MGTPU_X", "0")
    assert variant_flag("MGTPU_X", np=512) is False
    monkeypatch.setenv("MGTPU_X", "1")
    assert variant_flag("MGTPU_X", np=512) is True
    monkeypatch.setenv("MGTPU_X", "np>=256")
    assert variant_flag("MGTPU_X", np=512, ns=0) is True
    assert variant_flag("MGTPU_X", np=64, ns=9999) is False
    # unknown dimension keys make the clause false, OR across clauses
    monkeypatch.setenv("MGTPU_X", "nc>=1,ns>4000")
    assert variant_flag("MGTPU_X", np=512, ns=4001) is True
    assert variant_flag("MGTPU_X", np=512, ns=4000) is False
    monkeypatch.setenv("MGTPU_X", "banana")
    with pytest.raises(ValueError):
        variant_flag("MGTPU_X", np=1)


def test_default_policy_entries_parse(monkeypatch):
    """Every DEFAULT_POLICY entry must parse under the consumer it feeds
    (variant_flag grammar / _chain_k / kadapt int) — a malformed default
    would otherwise only surface on a real TPU session (round-4 verdict
    weak #3 follow-up: CI must cover the shipped composition verbatim)."""
    from dealii_multigrid_tpu.utils import flags

    chain_keys = {"MGTPU_GC_CHAIN", "MGTPU_LS_CHAIN"}
    int_keys = {"MGTPU_KADAPT"}
    for k, v in flags.DEFAULT_POLICY.items():
        monkeypatch.setenv(k, v)
        if k in chain_keys or k in int_keys:
            assert int(v or "0") >= 0
        else:
            # must evaluate (not raise) for both operator- and
            # transfer-shaped dimension sets
            flags.variant_flag(k, np=512, ns=4000)
            flags.variant_flag(k, nc=64)


def test_pin_policy_env_matches_shipped(monkeypatch):
    """pin_policy_env must hand tests the SHIPPED values (modulo the
    documented shape-conditional force-on), so a flag default change
    cannot silently diverge from what CI covers."""
    from dealii_multigrid_tpu.utils import flags

    pinned: dict = {}
    flags.pin_policy_env(pinned.__setitem__)
    assert set(pinned) == set(flags.DEFAULT_POLICY)
    for k, v in flags.DEFAULT_POLICY.items():
        if any(d in v for d in ("np", "nc", "ns")):
            assert pinned[k] == "1"
        else:
            assert pinned[k] == v
    # chain defaults reach the solver-side readers verbatim
    for k in ("MGTPU_GC_CHAIN", "MGTPU_LS_CHAIN"):
        monkeypatch.setenv(k, pinned[k])
    assert flags.gc_chain_k() == int(flags.DEFAULT_POLICY["MGTPU_GC_CHAIN"])
    assert flags.ls_chain_k() == int(flags.DEFAULT_POLICY["MGTPU_LS_CHAIN"])


def test_default_policy_gated_off_on_cpu(monkeypatch):
    # DEFAULT_POLICY holds TPU-measured winners: on a process that forces
    # the CPU platform (this suite) the policy must NOT apply, while an
    # explicit env setting still does.
    from dealii_multigrid_tpu.utils import flags

    monkeypatch.delenv("MGTPU_TSTENCIL", raising=False)
    monkeypatch.setitem(flags.DEFAULT_POLICY, "MGTPU_TSTENCIL", "1")
    assert flags.variant_flag("MGTPU_TSTENCIL", np=512) is False
    monkeypatch.setenv("MGTPU_TSTENCIL", "1")
    assert flags.variant_flag("MGTPU_TSTENCIL", np=512) is True


def test_shape_conditional_flags_build_per_level(monkeypatch):
    # a threshold policy must flip flags level-by-level at build time
    monkeypatch.setenv("MGTPU_TSTENCIL", "np>=16")
    levels = _levels("quadrant", 4, 2, jnp.float64)
    flags = [lv.op.use_tstencil for lv in levels if lv.op.NS]
    nps = [lv.op.NP for lv in levels if lv.op.NS]
    assert flags == [n >= 16 for n in nps]
    assert any(flags) and not all(flags), (
        "test mesh should straddle the np>=16 threshold; got NP=" + str(nps)
    )
