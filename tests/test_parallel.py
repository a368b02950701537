"""Partitioning policies + metrics + sharded execution tests."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from dealii_multigrid_tpu import api
from dealii_multigrid_tpu.mesh import generators as G, dof as D
from dealii_multigrid_tpu.mesh.coarsening import geometric_coarsening_sequence
from dealii_multigrid_tpu.parallel import metrics, partition, sharding as SH
from dealii_multigrid_tpu.solvers.cg import cg_solve


def _hierarchy(r=4, p=2):
    m = G.create_quadrant(3, r)
    seq = geometric_coarsening_sequence(m)
    dofh = D.distribute_dofs(m, p)
    hang = D.make_hanging_node_constraints(dofh)
    return m, seq, dofh, hang


@pytest.mark.parametrize(
    "name",
    ["DefaultPolicy", "CellWeightPolicy-2.0", "FirstChildPolicy",
     "MinimalGranularityPolicy-10", "BalancedGranularityPartitionPolicy"],
)
def test_partition_policies_valid(name):
    m, seq, dofh, hang = _hierarchy()
    parts = partition.partition_hierarchy(name, seq, 8, dofh, hang)
    assert len(parts) == len(seq)
    for mm, pp in zip(seq, parts):
        assert len(pp) == mm.n_cells
        assert pp.min() >= 0 and pp.max() < 8


def test_cell_weight_policy_balances_weight():
    m, seq, dofh, hang = _hierarchy()
    w = partition.hanging_nodes_weighting(dofh, 2.0, hang)
    part = partition.cell_weight_policy(m, 8, 2.0, dofh, hang)
    loads = np.bincount(part, weights=w, minlength=8)
    assert loads.max() / max(loads.mean(), 1) < 1.5


def test_metrics_ranges():
    m, seq, dofh, hang = _hierarchy()
    stats = metrics.multigrid_statistics(seq, 8, 2)
    assert 0 < stats["workload_eff"] <= 1.0
    assert 0 < stats["vertical_eff"] <= 1.0
    assert 0 < stats["horizontal_eff"] <= 1.0
    assert stats["mem_total"] > 0
    assert stats["workload_path_max"] >= seq[-1].n_cells / 8


def test_vertical_cost_exact_definition():
    """vertical_communication_cost matches a brute-force required-children
    count (reference definition, mg_tools.h:115-189)."""
    m, seq, *_ = _hierarchy(r=3)
    n_shards = 4
    parts = [metrics.block_partition(mm.n_cells, n_shards) for mm in seq]
    local, remote = metrics.vertical_communication_cost(seq, parts, n_shards)
    for l in range(1, len(seq)):
        coarse, fine = seq[l - 1], seq[l]
        pc, pf = parts[l - 1], parts[l]
        where = {
            (int(fine.level[i]), tuple(fine.anchor[i])): i
            for i in range(fine.n_cells)
        }
        bl = np.zeros(n_shards, np.int64)
        br = np.zeros(n_shards, np.int64)
        for c in range(coarse.n_cells):
            if coarse.level[c] + 1 > fine.max_level:
                continue
            for dz in (0, 1):
                for dy in (0, 1):
                    for dx in (0, 1):
                        key = (
                            int(coarse.level[c]) + 1,
                            tuple(coarse.anchor[c] * 2 + np.array([dz, dy, dx])),
                        )
                        j = where.get(key)
                        if j is None:
                            continue
                        if pf[j] == pc[c]:
                            bl[pc[c]] += 1
                        else:
                            br[pc[c]] += 1
        assert np.array_equal(local[l], bl) and np.array_equal(remote[l], br)


def test_horizontal_cost_exact_definition():
    """horizontal_communication_cost matches a brute-force bounding-box
    vertex-adjacency ghost count (mg_tools.h:191-233)."""
    m = G.create_quadrant(3, 3)
    n_shards = 4
    part = metrics.block_partition(m.n_cells, n_shards)
    local, remote = metrics.horizontal_communication_cost([m], [part], n_shards)
    assert np.array_equal(local[0], np.bincount(part, minlength=n_shards))
    # brute force: cells are vertex-adjacent iff closed boxes intersect
    s = (m.max_level - m.level).astype(np.int64)
    lo = m.anchor.astype(np.int64) << s[:, None]
    hi = (m.anchor.astype(np.int64) + 1) << s[:, None]
    ghost_pairs = set()
    for i in range(m.n_cells):
        touch = np.all((lo[i] <= hi) & (lo <= hi[i]), axis=1)
        touch[i] = False
        for j in np.nonzero(touch)[0]:
            if part[i] != part[j]:
                ghost_pairs.add((j, int(part[i])))  # j is ghost on part[i]
    br = np.zeros(n_shards, np.int64)
    for _, shard in ghost_pairs:
        br[shard] += 1
    assert np.array_equal(remote[0], br)


def test_workload_path_node_invariants():
    """node_size=1 reduces to the per-shard path; node_size=n_shards gives
    the total-cells-per-level sum (mg_tools.h:296-314)."""
    m, seq, *_ = _hierarchy(r=3)
    parts = [metrics.block_partition(mm.n_cells, 8) for mm in seq]
    p1 = metrics.workload_path_max_node(seq, parts, 8, node_size=1)
    assert p1 == metrics.workload_path_max(seq, parts, 8)
    pall = metrics.workload_path_max_node(seq, parts, 8, node_size=8)
    assert pall == float(sum(mm.n_cells for mm in seq))
    stats = metrics.print_multigrid_statistics(
        seq, 8, 2, partitions=parts, stream=open("/dev/null", "w")
    )
    assert set(stats) >= {
        "workload_eff", "workload_path_max", "workload_path_max_node",
        "vertical_eff", "horizontal_eff", "mem_total",
    }


def test_native_unique_inverse_matches_numpy():
    rng = np.random.default_rng(7)
    keys = rng.integers(0, 50, size=2000).astype(np.int64) * 977 + 13
    from dealii_multigrid_tpu.mesh.native import unique_inverse

    first, inverse = unique_inverse(keys)
    _, nfirst, ninverse = np.unique(keys, return_index=True, return_inverse=True)
    assert np.array_equal(first, nfirst)
    assert np.array_equal(inverse, ninverse)


def test_sharded_cg_matches_single_device():
    """Same CG result on an 8-device mesh as on one device (domain
    decomposition over Morton cell blocks)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    m = G.create_quadrant(3, 3)
    lv = api.build_level(m, 1, jnp.float64)
    mesh = SH.make_device_mesh(8)
    op = SH.pad_level_for_sharding(lv.op, 8)
    op = SH.shard_level_arrays(op, mesh)
    rng = np.random.default_rng(0)
    b_host = rng.normal(size=lv.dofh.n_dofs)
    b = jnp.zeros(op.n_dofs).at[: lv.dofh.n_dofs].set(jnp.asarray(b_host))
    b = b.at[op.constrained].set(0)
    b = SH.shard_vector(b, mesh)
    res = jax.jit(lambda bb: cg_solve(op.vmult, bb, maxiter=20, reltol=1e-6))(b)
    res1 = jax.jit(
        lambda bb: cg_solve(lv.op.vmult, bb, maxiter=20, reltol=1e-6)
    )(b[: lv.dofh.n_dofs])
    assert np.allclose(
        np.asarray(res.x[: lv.dofh.n_dofs]), np.asarray(res1.x), atol=1e-10
    )


def test_sharded_mg_matches_single_device():
    """Full HMG-global V-cycle CG on an 8-device mesh == single-device solve
    (the reference's any-rank-count property, SURVEY §4).  The driver's
    dryrun_multichip runs the full r=5/p=3 config (singleton sweeps +
    structured singleton faces asserted active); the suite uses r=4/p=3 to
    keep CI time bounded."""
    from dealii_multigrid_tpu.parallel.sharding import dryrun_sharded_solve

    rel = dryrun_sharded_solve(8, n_ref=4, degree=3, debug=True)
    assert rel < 1e-8


def test_policy_changes_metrics():
    """PartitionerName measurably alters the partition-quality columns
    (reference: policy selection, multigrid_throughput.cc:2066-2175)."""
    import numpy as np

    from dealii_multigrid_tpu.mesh import generators
    from dealii_multigrid_tpu.mesh.coarsening import geometric_coarsening_sequence
    from dealii_multigrid_tpu.mesh.dof import distribute_dofs
    from dealii_multigrid_tpu.parallel import metrics
    from dealii_multigrid_tpu.parallel.partition import partition_hierarchy

    mesh = generators.create("quadrant", 3, 3, 0)
    seq = geometric_coarsening_sequence(mesh)
    dofh = distribute_dofs(seq[-1], 2)
    stats = {}
    for name in ("DefaultPolicy", "CellWeightPolicy-2.0", "FirstChildPolicy"):
        parts = partition_hierarchy(name, seq, 8, dofh)
        stats[name] = metrics.multigrid_statistics(seq, 8, 2, partitions=parts)
    # weighting hanging cells changes the workload balance
    assert (
        stats["CellWeightPolicy-2.0"]["workload_eff"]
        != stats["DefaultPolicy"]["workload_eff"]
    )
    # FirstChild maximises parent/child locality
    assert (
        stats["FirstChildPolicy"]["vertical_eff"]
        >= stats["DefaultPolicy"]["vertical_eff"]
    )


def test_sharded_solve_with_policy_api():
    """params.n_shards + Partitioner alias drive a sharded production solve
    through the api, with sub_comm_size reported."""
    import jax.numpy as jnp

    from dealii_multigrid_tpu import api
    from dealii_multigrid_tpu.mesh import generators
    from dealii_multigrid_tpu.utils.params import RunParameters

    p = RunParameters()
    p.type = "HMG-global"
    p.geometry_type = "quadrant"
    p.n_ref_global = 3
    p.fe_degree_fine = 2
    p.number_type = "float"
    p.mg_number_type = "float"
    p.mg_data.coarse_solver.type = "amg"
    p.mg_data.smoother.degree = 3
    p.mg_data.n_repetitions = 1
    p.n_shards = 8
    p.partitioner = 5  # CellWeightPolicy-2.0
    mesh = generators.create("quadrant", 3, 3, 0)
    res, prob, lvls = api.solve_with_global_coarsening_hybrid(p, mesh)
    assert res.converged and res.n_iterations <= 6
    assert res.n_shards == 8
    assert any(lv.op.n_shards == 8 for lv in lvls)


def test_sharded_ls_matches_single_device():
    """HMG-local (hybrid engine) with per-LEVEL-mesh Morton device-major
    partitions on an 8-device mesh == single-device solve (the reference's
    per-level partitioners in MGTransferMatrixFree,
    multigrid_throughput.cc:1800-1802).  The driver's dryrun runs r=5/p=3;
    the suite uses r=4/p=2 to keep CI time bounded."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from dealii_multigrid_tpu.parallel.sharding import dryrun_sharded_ls_solve

    rel = dryrun_sharded_ls_solve(8, n_ref=4, degree=2)
    assert rel < 1e-8


def test_sharded_hpmg_local_solves():
    """HPMG-local (p-levels chained above local smoothing) through the
    production api with n_shards=8: converged with bounded iterations and
    consistent with the unsharded solve."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from dealii_multigrid_tpu.utils.params import RunParameters

    def solve(n_shards):
        p = RunParameters()
        p.type = "HPMG-local"
        p.geometry_type = "quadrant"
        p.n_ref_global = 3
        p.fe_degree_fine = 2
        p.number_type = "double"
        p.mg_number_type = "double"
        p.mg_data.coarse_solver.type = "amg"
        p.mg_data.smoother.degree = 3
        p.mg_data.n_repetitions = 1
        p.n_shards = n_shards
        mesh = G.create_quadrant(3, 3)
        res, prob, lvls = api.solve_with_local_smoothing_hybrid(p, mesh)
        return np.asarray(res.x), res.n_iterations, res.converged

    prev = jax.config.jax_enable_x64
    jax.config.update("jax_enable_x64", True)
    try:
        x1, it1, c1 = solve(1)
        x8, it8, c8 = solve(8)
    finally:
        jax.config.update("jax_enable_x64", prev)
    assert c1 and c8
    rel = np.linalg.norm(x8 - x1) / max(np.linalg.norm(x1), 1e-300)
    assert rel < 1e-8, rel
    assert abs(it8 - it1) <= 1


@pytest.mark.parametrize(
    "typ,number",
    [("PMG", "float"), ("HPMG", "float"), ("HMG-global", "mixed")],
)
def test_sharded_gc_variants_match_single_device(typ, number):
    """Sharded PMG / HPMG / mixed-precision HMG-global == single-device
    (VERDICT-r2 'multi-chip validation breadth': beyond the HMG-global
    float dryrun, the p-coarsening level stacks and the f64-outer boundary
    must survive the domain decomposition unchanged)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from dealii_multigrid_tpu.utils.params import RunParameters

    def solve(n_shards):
        prm = RunParameters()
        prm.type = typ
        prm.geometry_type = "quadrant"
        prm.n_ref_global = 3
        prm.fe_degree_fine = 2
        prm.number_type = number
        prm.mg_number_type = "float"
        prm.mg_data.coarse_solver.type = "amg"
        prm.mg_data.smoother.degree = 3
        prm.mg_data.cg_normal.reltol = 1e-6
        prm.mg_data.n_repetitions = 1
        prm.n_shards = n_shards
        mesh = G.create("quadrant", 3, prm.n_ref_global, 0)
        return api.solve_with_global_coarsening_hybrid(prm, mesh)

    res1, _, _ = solve(1)
    res8, _, _ = solve(8)
    assert res8.converged
    assert abs(res8.n_iterations - res1.n_iterations) <= 1
    x1 = np.asarray(res1.x, np.float64)
    x8 = np.asarray(res8.x, np.float64)
    rel = np.linalg.norm(x8 - x1) / np.linalg.norm(x1)
    # the V-cycle applies in f32 under both precisions and sharding changes
    # its reduction order, so solutions agree to the f32-application level
    # (measured ~7e-8 for mixed), well below the 1e-6 solve tolerance
    assert rel < 1e-5, (typ, number, rel)


def test_sharded_solve_under_production_flags(monkeypatch):
    """8-device sharded GC solve == single-device with the FULL TPU
    production pipeline forced on (tv + tcfaces + tsplit + rowsf +
    tvcycle + ttransfer + adaptive K).  DEFAULT_POLICY engages these on
    any non-CPU platform — including real multi-chip — while every other
    sharded test runs with the flags off (CPU default), so this is the
    only coverage of the sharding x lane-dense-pipeline composition the
    driver's dryrun cannot see (it runs on the CPU backend too)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from dealii_multigrid_tpu.utils.params import RunParameters

    from dealii_multigrid_tpu.utils import flags

    flags.pin_policy_env(monkeypatch.setenv)

    def solve(n_shards):
        prm = RunParameters()
        prm.type = "HMG-global"
        prm.geometry_type = "quadrant"
        prm.n_ref_global = 3
        prm.fe_degree_fine = 3
        prm.number_type = "float"
        prm.mg_number_type = "float"
        prm.mg_data.coarse_solver.type = "amg"
        prm.mg_data.smoother.degree = 3
        prm.mg_data.cg_normal.reltol = 1e-6
        prm.mg_data.n_repetitions = 1
        prm.n_shards = n_shards
        mesh = G.create("quadrant", 3, prm.n_ref_global, 0)
        return api.solve_with_global_coarsening_hybrid(prm, mesh)

    res1, _, _ = solve(1)
    res8, _, _ = solve(8)
    assert res8.converged
    assert res8.n_iterations == res1.n_iterations
    x1 = np.asarray(res1.x, np.float64)
    x8 = np.asarray(res8.x, np.float64)
    rel = np.linalg.norm(x8 - x1) / np.linalg.norm(x1)
    # f32 end-to-end; sharding only changes reduction order
    assert rel < 1e-5, rel
