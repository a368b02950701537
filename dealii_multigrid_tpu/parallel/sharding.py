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
