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


def dryrun_sharded_solve(
    n_devices: int,
    n_ref: int = 3,
    degree: int = 2,
    reltol: float = 1e-10,
) -> float:
    """Full HMG-global V-cycle-preconditioned CG over an n_devices mesh,
    asserted equal to the single-device solve.

    The reference's run-the-same-code-at-any-rank-count property (SURVEY §4;
    multigrid_throughput.cc:2041-2046): the Morton cell-block partition is the
    p4est SFC partition analog; coarse levels whose cell count drops below the
    device count are REPLICATED (computed redundantly on every device — the
    TPU-native form of the reference's shrinking sub-communicators, where idle
    ranks would waste the hardware instead).  Returns the relative L2
    difference between the sharded and the single-device solution.
    """
    import jax

    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from .. import api
    from ..mesh import generators
    from ..mesh.coarsening import geometric_coarsening_sequence
    from ..models import poisson
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

    def build_and_solve(dmesh: Mesh | None):
        levels = [api.build_level(m, d, dtype) for m, d in plan]
        fine = levels[-1]
        problem = poisson.make_problem(
            fine.dofh, fine.hanging, fine.op, "Gaussian"
        )
        mg, _ = api.build_gc_preconditioner(levels, mg_data, dtype, dtype)
        precond = PreconditionMG(mg, dtype)
        rhs = problem.rhs

        if dmesh is None:
            constrain = lambda v: v
        else:
            # the scaling-book recipe: annotate the sharding, let XLA SPMD
            # place the collectives (dims need not divide the device count
            # inside jit)
            sh = NamedSharding(dmesh, P(CELL_AXIS))
            constrain = lambda v: jax.lax.with_sharding_constraint(v, sh)

        @jax.jit
        def solve(fop, pre, b):
            return cg_solve(
                fop.vmult,
                constrain(b),
                preconditioner=pre.vmult,
                maxiter=100,
                reltol=reltol,
            )

        res = jax.block_until_ready(solve(fine.op, precond, rhs))
        return np.asarray(res.x), int(res.n_iterations)

    x_ref, it_ref = build_and_solve(None)
    dmesh = make_device_mesh(n_devices)
    x_sh, it_sh = build_and_solve(dmesh)
    rel = float(
        np.linalg.norm(x_sh - x_ref) / max(np.linalg.norm(x_ref), 1e-300)
    )
    assert rel < 1e-8, f"sharded solve diverged from single-device: {rel:e}"
    assert abs(it_sh - it_ref) <= 1, (it_sh, it_ref)
    return rel
