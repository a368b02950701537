"""Distribution layer: shard the multigrid data structures over a TPU mesh.

The reference distributes via MPI + p4est Morton-order partitions with ghost
exchange hidden in Partitioner-backed vectors (SURVEY.md §2c, L0).  The
TPU-native equivalent implemented here: active cells are already Morton-sorted
(mesh/octree.py), so a block partition of the cell axis IS the p4est
space-filling-curve partition; cell-batch arrays are sharded over a 1D device
mesh axis and DoF vectors are sharded over the same axis.  The gather /
scatter-add between them is expressed globally and XLA SPMD inserts the halo
collectives (the scaling-book recipe: annotate shardings, let the compiler
place the communication).

Padding keeps every shard shape static and equal (XLA requirement for clean
partitioning): dummy cells carry scale 0 (their scatter contribution is
exactly zero) and dummy DoF slots are never referenced by any real cell.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.operator import ConstraintTable, LaplaceOperator
from ..utils.device import to_device

CELL_AXIS = "cells"


def make_device_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (CELL_AXIS,))


def _pad_to(x: np.ndarray | jax.Array, n: int, fill=0):
    pad = n - x.shape[0]
    if pad == 0:
        return x
    widths = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, widths, constant_values=fill)


def pad_level_for_sharding(op: LaplaceOperator, n_shards: int) -> LaplaceOperator:
    """Pad cell batch + vector lengths to multiples of the shard count.

    Dummy cells point at DoF 0 but carry scale 0, so their GEMM output is
    exactly zero and the scatter-add is a no-op.  The padded operator's
    ``n_dofs`` grows to the padded vector length; callers must build vectors
    with ``op.new_vector()`` / pad RHS accordingly.
    """
    def up(n, m):
        return -(-n // m) * m

    nc = up(op.cell_dofs.shape[0], n_shards)
    nd = up(op.n_dofs, n_shards)
    return dataclasses.replace(
        op,
        cell_dofs=_pad_to(op.cell_dofs, nc),
        scale=_pad_to(op.scale, nc),
        n_dofs=nd,
    )


def shard_level_arrays(op: LaplaceOperator, mesh: Mesh) -> LaplaceOperator:
    """Place the operator's arrays with explicit shardings: cell-batch arrays
    block-partitioned along the Morton cell axis, small constraint tables and
    the shared element matrix replicated."""
    cells = NamedSharding(mesh, P(CELL_AXIS))
    cells2d = NamedSharding(mesh, P(CELL_AXIS, None))
    repl = NamedSharding(mesh, P())
    return dataclasses.replace(
        op,
        cell_dofs=jax.device_put(op.cell_dofs, cells2d),
        scale=jax.device_put(op.scale, cells),
        elem=jax.device_put(op.elem, repl),
        hanging=ConstraintTable(
            jax.device_put(op.hanging.slave, repl),
            jax.device_put(op.hanging.masters, repl),
            jax.device_put(op.hanging.weights, repl),
        ),
        dirichlet=jax.device_put(op.dirichlet, repl),
        constrained=jax.device_put(op.constrained, repl),
    )


def shard_vector(v: jax.Array, mesh: Mesh) -> jax.Array:
    return jax.device_put(v, NamedSharding(mesh, P(CELL_AXIS)))


def replicate(v: jax.Array, mesh: Mesh) -> jax.Array:
    return jax.device_put(v, NamedSharding(mesh, P()))


# ---------------------------------------------------------------------------
# hybrid (patch-structured) engine sharding — the production path
# ---------------------------------------------------------------------------
#
# The hybrid format's device-major layout (ops/hybrid.py: HybridFormat with
# n_shards = D) pads patch/singleton counts to multiples of D so that an even
# block partition of the flat slot axis puts whole patches on devices.  Here
# the arrays are PLACED: slot vectors and per-patch/per-singleton arrays are
# sharded over the 1D device mesh, small irregular tables are replicated.
# The exchange's face-plane gathers become surface-sized collectives (the
# ghost exchange of reference include/operator.h:146-167); everything bulk
# stays local.  Levels with n_shards == 1 are replicated — redundant compute
# on every device, the TPU-native analog of the reference's shrinking coarse
# sub-communicators (multigrid_throughput.cc:1464-1501) without idle ranks.


def place_hybrid_op(op, dmesh: Mesh):
    """Place a HybridOperator's arrays on the device mesh according to its
    n_shards (sharded if > 1, fully replicated if == 1)."""
    import dataclasses

    if op.n_shards > 1:
        sh1 = NamedSharding(dmesh, P(CELL_AXIS))
        sh2 = NamedSharding(dmesh, P(None, CELL_AXIS))
    else:
        sh1 = sh2 = NamedSharding(dmesh, P())
    rep = NamedSharding(dmesh, P())
    put = jax.device_put

    def rep_tree(t):
        return jax.tree.map(lambda a: put(a, rep), t)

    return dataclasses.replace(
        op,
        KS=put(op.KS, rep),
        MS=put(op.MS, rep),
        elem=put(op.elem, rep),
        pscale=put(op.pscale, sh1),
        sscale=put(op.sscale, sh1),
        nbr=put(op.nbr, sh2),
        nbr_mask=put(op.nbr_mask, sh2),
        snbr=put(op.snbr, sh2),
        snbr_mask=put(op.snbr_mask, sh2),
        irr_buckets=rep_tree(op.irr_buckets),
        dirichlet_keep=put(op.dirichlet_keep, sh1),
        slave_keep=put(op.slave_keep, sh1),
        constrained_keep=put(op.constrained_keep, sh1),
        slave_master_slots=rep_tree(op.slave_master_slots),
        slave_w=rep_tree(op.slave_w),
        slave_all_slots=rep_tree(op.slave_all_slots),
        slave_all_src=rep_tree(op.slave_all_src),
        slave_rep=rep_tree(op.slave_rep),
        ct_target=rep_tree(op.ct_target),
        ct_src=rep_tree(op.ct_src),
        ct_w=rep_tree(op.ct_w),
        refresh_slots=rep_tree(op.refresh_slots),
        refresh_src=rep_tree(op.refresh_src),
        owner=put(op.owner, sh1),
        sf_patch=rep_tree(op.sf_patch),
        sf_single=rep_tree(op.sf_single),
        sf_patch_rows=rep_tree(op.sf_patch_rows),
        sf_single_rows=rep_tree(op.sf_single_rows),
        sf_patch_src=rep_tree(op.sf_patch_src),
        sf_single_src=rep_tree(op.sf_single_src),
        sf_E1=put(op.sf_E1, rep),
        sf_slave_keep=put(op.sf_slave_keep, sh1),
        sf_Eh=put(op.sf_Eh, rep) if op.sf_Eh is not None else None,
        cross=rep_tree(op.cross),
        Easm=put(op.Easm, rep) if op.Easm is not None else None,
        ssweep_T=put(op.ssweep_T, rep) if op.ssweep_T is not None else None,
        sface_sel=put(op.sface_sel, rep) if op.sface_sel is not None else None,
        sface_selT=put(op.sface_selT, rep) if op.sface_selT is not None else None,
        pnbr_P=put(op.pnbr_P, rep) if op.pnbr_P is not None else None,
        tv=rep_tree(op.tv) if op.tv is not None else None,
    )


def place_hybrid_level(level, dmesh: Mesh):
    """Place a HybridLevel's arrays on the device mesh according to its
    format's n_shards (sharded if > 1, fully replicated if == 1)."""
    import dataclasses

    op = place_hybrid_op(level.op, dmesh)
    if op.n_shards > 1:
        sh1 = NamedSharding(dmesh, P(CELL_AXIS))
    else:
        sh1 = NamedSharding(dmesh, P())
    rep = NamedSharding(dmesh, P())
    put = jax.device_put
    return dataclasses.replace(
        level,
        op=op,
        inv_diag=put(level.inv_diag, sh1),
        eig_b0=put(level.eig_b0, sh1),
        from_global_idx=put(level.from_global_idx, sh1),
        to_global_idx=put(level.to_global_idx, rep),
    )


def default_cell_shard_map(fmt, n_cells: int) -> np.ndarray:
    """Reconstruct the cell->device map a device-major HybridFormat applies
    (repartition_format: patch/singleton index blocks — the p4est
    DefaultPolicy analog).  Used to report the partition ACTUALLY applied in
    the MG statistics when no explicit policy produced one."""
    D = fmt.n_shards
    out = np.zeros(n_cells, np.int32)
    if D <= 1:
        return out
    NPp = len(fmt.patch_level)
    if NPp:
        pps = NPp // D
        pc = np.asarray(fmt.patch_cells)
        if pc.ndim == 1:
            pc = pc[:, None]
        shard = (np.arange(NPp) // pps).astype(np.int32)
        valid = pc >= 0
        out[pc[valid]] = np.repeat(shard, pc.shape[1])[valid.ravel()]
    sc = np.asarray(fmt.single_cells)
    NSp = len(sc)
    if NSp:
        sps = NSp // D
        ok = sc >= 0
        out[sc[ok]] = ((np.arange(NSp) // sps).astype(np.int32))[ok]
    return out


def hybrid_level_shard_count(
    n_cells: int, n_devices: int, grain_size: int = 8
) -> int:
    """Per-level shard count: shard over all devices while each keeps at
    least ``grain_size`` cells, else replicate (the BalancedGranularity rule,
    reference multigrid_throughput.cc:370-420, adapted to the two-tier
    sharded/replicated TPU scheme)."""
    return n_devices if n_cells >= grain_size * n_devices else 1


def build_sharded_hybrid_levels(
    plan,
    level_dtype,
    dmesh: Mesh,
    n_devices: int,
    policy_name: str = "",
):
    """Hybrid levels for a GC plan, each sharded or replicated, placed on the
    device mesh.

    ``policy_name`` selects a repartitioning policy (the reference's
    PartitionerName dispatch, multigrid_throughput.cc:2066-2175): the policy's
    cell->shard maps drive the device-major patch layout of every level.  A
    level whose policy partition collapses to one shard — or, with no policy,
    whose cell count drops below the granularity threshold — is replicated
    (redundant compute, the sub-communicator analog).  Returns
    (levels, partitions): the partitions actually applied (None entries for
    replicated levels)."""
    from .. import api
    from . import partition as PT

    parts = None
    if policy_name:
        meshes = [m for m, _ in plan]
        fine_dofh = None
        if policy_name.startswith("CellWeightPolicy"):
            from ..mesh.dof import distribute_dofs

            fine_dofh = distribute_dofs(meshes[-1], plan[-1][1])
        parts = PT.partition_hierarchy(policy_name, meshes, n_devices, fine_dofh)

    levels = []
    applied = []
    level_ks = api.choose_level_ks(plan)
    for li, (mesh0, degree) in enumerate(plan):
        cell_shard = None
        if parts is not None and mesh0.n_cells >= n_devices:
            part = np.asarray(parts[li])
            n_eff = int(part.max()) + 1
            if n_eff > 1:
                cell_shard = part
                D = n_devices
            else:
                D = 1
        else:
            D = hybrid_level_shard_count(mesh0.n_cells, n_devices)
        lv = api.build_level_hybrid(
            mesh0, degree, level_dtype, K=level_ks[li],
            n_shards=D, cell_shard=cell_shard,
        )
        levels.append(place_hybrid_level(lv, dmesh))
        # record the partition ACTUALLY applied: the default index-block
        # layout is a real partition too (None = replicated level only)
        if cell_shard is None and D > 1:
            cell_shard = default_cell_shard_map(lv.fmt, mesh0.n_cells)
        applied.append(cell_shard)
    return levels, applied


def dryrun_sharded_solve(
    n_devices: int,
    n_ref: int = 5,
    degree: int = 3,
    reltol: float = 1e-10,
    debug: bool = False,
) -> float:
    """Full HMG-global V-cycle-preconditioned CG on the PRODUCTION (hybrid
    patch-structured) engine, domain-decomposed over an n_devices mesh and
    asserted equal to the single-device solve.

    The reference's run-the-same-code-at-any-rank-count property (SURVEY §4;
    multigrid_throughput.cc:2041-2046): the Morton patch-block partition is
    the p4est SFC partition analog; coarse levels below the granularity
    threshold are REPLICATED (redundant compute on every device — the
    TPU-native form of the reference's shrinking sub-communicators, with no
    idle ranks).  Returns the relative L2 difference between the sharded and
    the single-device solution in the GLOBAL DoF layout (the slot layouts
    differ by construction).

    jax_enable_x64 is turned on for the f64 comparison and RESTORED to its
    previous value on exit, so a float CLI solve after a dryrun in the same
    process keeps f32 dtype promotion.
    """
    import jax

    x64_prev = bool(jax.config.jax_enable_x64)
    jax.config.update("jax_enable_x64", True)
    if debug:
        # shard-debug mode (SURVEY §5: sanitizer analog): trap NaNs inside
        # every jitted computation; restored on exit (see finally below)
        jax.config.update("jax_debug_nans", True)
    import jax.numpy as jnp

    from .. import api
    from ..mesh import generators
    from ..mesh.coarsening import geometric_coarsening_sequence
    from ..models import poisson
    from ..ops.operator import make_operator
    from ..solvers.cg import cg_solve
    from ..solvers.multigrid import PreconditionMG
    from ..utils.params import MultigridParameters

    dtype = jnp.float64
    mesh0 = generators.create("quadrant", 3, n_ref, 0)
    tri_seq = geometric_coarsening_sequence(mesh0)
    plan = api.gc_level_plan("HMG-global", tri_seq, degree)
    mg_data = MultigridParameters()
    mg_data.smoother.degree = 3
    mg_data.coarse_solver.type = "amg"

    def build_and_solve(dmesh: Mesh | None, policy_name: str = ""):
        if dmesh is None:
            levels = [
                api.build_level_hybrid(m, d, dtype, n_shards=1) for m, d in plan
            ]
        else:
            levels, _ = build_sharded_hybrid_levels(
                plan, dtype, dmesh, n_devices, policy_name
            )
        fine = levels[-1]
        # the default config must exercise the machinery that dominates
        # production runs: singleton sweeps + structured singleton faces
        if n_ref >= 5:
            assert fine.fmt.use_singleton_sweeps, "singleton sweeps inactive"
            assert any(
                g is not None for g in fine.op.sf_single
            ), "no structured singleton faces at the dryrun scale"
        if debug:
            # ownership-mask consistency: every real DoF owned exactly once
            for lv in levels:
                owned = np.asarray(lv.fmt.slot_dof)[np.asarray(lv.fmt.owner) > 0]
                counts = np.bincount(owned, minlength=lv.dofh.n_dofs + 1)
                assert (counts[: lv.dofh.n_dofs] == 1).all(), "owner mask broken"
        gop = make_operator(fine.dofh, fine.hanging, dtype=dtype)
        problem = poisson.make_problem(fine.dofh, fine.hanging, gop, "Gaussian")
        rhs = to_device(
            fine.fmt.from_global(np.asarray(problem.rhs, np.float64)), dtype
        )
        if dmesh is not None and fine.op.n_shards > 1:
            rhs = shard_vector(rhs, dmesh)
        mg = api.build_gc_preconditioner_hybrid(levels, mg_data, dtype)
        precond = PreconditionMG(mg, dtype)

        @jax.jit
        def solve(fop, pre, b):
            return cg_solve(
                fop.vmult,
                b,
                preconditioner=pre.vmult,
                maxiter=100,
                reltol=reltol,
                dot=fop.dot,
            )

        res = jax.block_until_ready(solve(fine.op, precond, rhs))
        x_global = np.asarray(fine.to_global(res.x))
        return x_global, int(res.n_iterations)

    try:
        x_ref, it_ref = build_and_solve(None)
        dmesh = make_device_mesh(n_devices)
        rel_max = 0.0
        # Morton-block default AND a weighted repartitioning policy: the same
        # code must run at any partition (the reference's tria.repartition()
        # property, multigrid_throughput.cc:2145-2170)
        for policy in ("", "CellWeightPolicy-2.0"):
            x_sh, it_sh = build_and_solve(dmesh, policy)
            rel = float(
                np.linalg.norm(x_sh - x_ref) / max(np.linalg.norm(x_ref), 1e-300)
            )
            assert rel < 1e-8, f"sharded solve ({policy!r}) diverged: {rel:e}"
            assert abs(it_sh - it_ref) <= 1, (policy, it_sh, it_ref)
            rel_max = max(rel_max, rel)
        return rel_max
    finally:
        jax.config.update("jax_enable_x64", x64_prev)
        if debug:
            jax.config.update("jax_debug_nans", False)


def dryrun_sharded_ls_solve(
    n_devices: int,
    n_ref: int = 5,
    degree: int = 3,
    reltol: float = 1e-10,
) -> float:
    """Full HMG-local (local-smoothing) V-cycle-preconditioned CG on the
    hybrid engine through the PRODUCTION path
    (api.solve_with_local_smoothing_hybrid), with per-LEVEL-mesh Morton
    device-major partitions (the reference's per-level partitioners,
    multigrid_throughput.cc:1800-1802), asserted equal to the single-device
    solve.  Returns the relative L2 difference in the global DoF layout."""
    import jax

    x64_prev = bool(jax.config.jax_enable_x64)
    jax.config.update("jax_enable_x64", True)
    try:
        import numpy as np

        from .. import api
        from ..mesh import generators
        from ..utils.params import RunParameters

        def solve(n_shards):
            params = RunParameters()
            params.type = "HMG-local"
            params.geometry_type = "quadrant"
            params.n_ref_global = n_ref
            params.fe_degree_fine = degree
            params.number_type = "double"
            params.mg_number_type = "double"
            params.mg_data.coarse_solver.type = "amg"
            params.mg_data.smoother.degree = 3
            params.mg_data.cg_normal.reltol = reltol
            params.mg_data.n_repetitions = 1
            params.n_shards = n_shards
            mesh = generators.create("quadrant", 3, n_ref, 0)
            result, _problem, _levels = api.solve_with_local_smoothing_hybrid(
                params, mesh
            )
            return np.asarray(result.x), result.n_iterations

        x_ref, it_ref = solve(1)
        x_sh, it_sh = solve(n_devices)
        rel = float(
            np.linalg.norm(x_sh - x_ref) / max(np.linalg.norm(x_ref), 1e-300)
        )
        assert rel < 1e-8, f"sharded LS solve diverged: {rel:e}"
        assert abs(it_sh - it_ref) <= 1, (it_sh, it_ref)
        return rel
    finally:
        jax.config.update("jax_enable_x64", x64_prev)
