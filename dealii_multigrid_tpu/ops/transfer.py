"""Two-level multigrid transfers (h and p) between independent DoFHandlers.

Capability mirror of deal.II's MGTwoLevelTransfer + MGTransferGlobalCoarsening
(reference usage: multigrid_throughput.cc:1600-1621).  TPU-first realisation:
at setup, every fine cell is matched to its coarse source cell and bucketed by
child octant (or 'identity' where the cell exists on both levels, or the
p-embedding for polynomial transfers).  Prolongation is then, per bucket,
``gather coarse cell DoFs -> GEMM with a shared (n_loc_f x n_loc_c) embedding
matrix -> valence-weighted scatter-add``; restriction is the exact transpose.
Shared fine DoFs use 1/valence weights so both directions are adjoint and
prolongation remains exact nodal interpolation of the (continuous,
constraint-distributed) coarse function.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..mesh.dof import DoFHandler, local_node_indices
from ..mesh.octree import morton_encode
from . import tensor
from .operator import ConstraintTable, LaplaceOperator, distribute, distribute_transpose
from ..utils.device import to_device


@dataclass(frozen=True)
class TransferBucket:
    fine_cells: jax.Array    # i32 [nb] — indices into fine cell list
    coarse_cells: jax.Array  # i32 [nb] — indices into coarse cell list
    matrix: jax.Array        # f [n_loc_f, n_loc_c]


jax.tree_util.register_dataclass(
    TransferBucket, data_fields=["fine_cells", "coarse_cells", "matrix"], meta_fields=[]
)


@dataclass(frozen=True)
class TwoLevelTransfer:
    """prolong: coarse -> fine; restrict: fine -> coarse (exact adjoint)."""

    buckets: tuple
    fine_cell_dofs: jax.Array
    coarse_cell_dofs: jax.Array
    fine_weight: jax.Array       # f [n_dofs_f] — 1/valence
    fine_constrained: jax.Array  # i32 — Dirichlet + hanging on fine level
    coarse_hanging: ConstraintTable
    coarse_dirichlet: jax.Array
    n_dofs_fine: int
    n_dofs_coarse: int

    def prolong(self, u_c: jax.Array) -> jax.Array:
        # zero coarse Dirichlet first so prolong/restrict are exact adjoints
        # (C_c = distribute ∘ zero, C_c^T = zero ∘ distribute^T)
        if self.coarse_dirichlet.shape[0]:
            u_c = u_c.at[self.coarse_dirichlet].set(0)
        u = distribute(u_c, self.coarse_hanging)
        out = jnp.zeros(self.n_dofs_fine, u_c.dtype)
        for b in self.buckets:
            vals = jnp.matmul(u[self.coarse_cell_dofs[b.coarse_cells]], b.matrix.T.astype(u_c.dtype), precision=jax.lax.Precision.HIGHEST)
            fdofs = self.fine_cell_dofs[b.fine_cells]
            out = out.at[fdofs.reshape(-1)].add(
                (vals * self.fine_weight[fdofs]).reshape(-1)
            )
        if self.fine_constrained.shape[0]:
            out = out.at[self.fine_constrained].set(0)
        return out

    def restrict(self, r_f: jax.Array) -> jax.Array:
        if self.fine_constrained.shape[0]:
            r_f = r_f.at[self.fine_constrained].set(0)
        rw = r_f * self.fine_weight
        acc = jnp.zeros(self.n_dofs_coarse, r_f.dtype)
        for b in self.buckets:
            vals = jnp.matmul(rw[self.fine_cell_dofs[b.fine_cells]], b.matrix.astype(r_f.dtype), precision=jax.lax.Precision.HIGHEST)
            cdofs = self.coarse_cell_dofs[b.coarse_cells]
            acc = acc.at[cdofs.reshape(-1)].add(vals.reshape(-1))
        acc = distribute_transpose(acc, self.coarse_hanging)
        if self.coarse_dirichlet.shape[0]:
            acc = acc.at[self.coarse_dirichlet].set(0)
        return acc


def _embedding_matrix(dim: int, degree: int, octant: int) -> np.ndarray:
    """Tensor-product h-embedding for one child octant (x-fastest kron order)."""
    E = tensor.h_embedding_1d(degree)
    out = np.array([[1.0]])
    for d in range(dim):
        b = (octant >> d) & 1
        out = np.kron(E[b], out)
    return out


def _p_embedding_matrix(dim: int, deg_c: int, deg_f: int) -> np.ndarray:
    E = tensor.p_embedding_1d(deg_c, deg_f)
    out = np.array([[1.0]])
    for _ in range(dim):
        out = np.kron(E, out)
    return out


def make_two_level_transfer(
    fine: DoFHandler,
    coarse: DoFHandler,
    fine_op: LaplaceOperator,
    coarse_op: LaplaceOperator,
    dtype=jnp.float32,
) -> TwoLevelTransfer:
    """Build the transfer between two level DoFHandlers.

    Same mesh + different degree => polynomial transfer; different mesh +
    same degree => geometric transfer (coarse mesh must be one global-
    coarsening step of the fine mesh's hierarchy).
    """
    dim = fine.dim
    mf, mc = fine.mesh, coarse.mesh
    buckets = []

    same_mesh = (
        mf.n_cells == mc.n_cells
        and mf.max_level == mc.max_level
        and np.array_equal(mf.level, mc.level)
        and np.array_equal(mf.anchor, mc.anchor)
    )

    if same_mesh:
        if fine.degree == coarse.degree:
            raise ValueError("no-op transfer: same mesh and same degree")
        M = _p_embedding_matrix(dim, coarse.degree, fine.degree)
        buckets.append(
            (np.arange(mf.n_cells, dtype=np.int64),
             np.arange(mc.n_cells, dtype=np.int64), M)
        )
    else:
        if fine.degree != coarse.degree:
            raise ValueError("h-transfer requires equal degrees")
        # match each fine cell to its coarse cell: identity (same cell active
        # in the coarse mesh) or parent (one level coarser)
        cindex = {}
        for l in np.unique(mc.level):
            sel = np.nonzero(mc.level == l)[0]
            codes = morton_encode(mc.anchor[sel])
            order = np.argsort(codes)
            cindex[int(l)] = (codes[order], sel[order])

        def lookup(level, anchors):
            got = cindex.get(int(level))
            if got is None:
                return np.full(len(anchors), -1, np.int64)
            codes_sorted, gidx = got
            q = morton_encode(anchors)
            pos = np.searchsorted(codes_sorted, q)
            pos = np.minimum(pos, len(codes_sorted) - 1)
            ok = codes_sorted[pos] == q
            out = np.where(ok, gidx[pos], -1)
            return out

        ident = np.full(mf.n_cells, -1, np.int64)
        for l in np.unique(mf.level):
            sel = np.nonzero(mf.level == l)[0]
            ident[sel] = lookup(l, mf.anchor[sel])
        id_cells = np.nonzero(ident >= 0)[0]
        if len(id_cells):
            n_loc = fine.n_loc
            buckets.append(
                (id_cells, ident[id_cells], np.eye(n_loc))
            )
        rest = np.nonzero(ident < 0)[0]
        if len(rest):
            par = np.full(len(rest), -1, np.int64)
            oct_ = np.zeros(len(rest), np.int64)
            for l in np.unique(mf.level[rest]):
                s = mf.level[rest] == l
                cells = rest[s]
                par_anchor = mf.anchor[cells] >> 1
                par[s] = lookup(l - 1, par_anchor)
                bits = mf.anchor[cells] & 1
                oct_[s] = sum(bits[:, d] << d for d in range(dim))
            if (par < 0).any():
                raise ValueError("fine cell without coarse source cell")
            for o in range(1 << dim):
                s = oct_ == o
                if s.any():
                    buckets.append(
                        (rest[s], par[s], _embedding_matrix(dim, fine.degree, o))
                    )

    valence = np.bincount(fine.cell_dofs.reshape(-1), minlength=fine.n_dofs)
    weight = 1.0 / np.maximum(valence, 1)

    return TwoLevelTransfer(
        buckets=tuple(
            TransferBucket(
                to_device(fc, jnp.int32),
                to_device(cc, jnp.int32),
                to_device(M, dtype),
            )
            for fc, cc, M in buckets
        ),
        fine_cell_dofs=fine_op.cell_dofs,
        coarse_cell_dofs=coarse_op.cell_dofs,
        fine_weight=to_device(weight, dtype),
        fine_constrained=fine_op.constrained,
        coarse_hanging=coarse_op.hanging,
        coarse_dirichlet=coarse_op.dirichlet,
        n_dofs_fine=fine.n_dofs,
        n_dofs_coarse=coarse.n_dofs,
    )


jax.tree_util.register_dataclass(
    TwoLevelTransfer,
    data_fields=[
        "buckets",
        "fine_cell_dofs",
        "coarse_cell_dofs",
        "fine_weight",
        "fine_constrained",
        "coarse_hanging",
        "coarse_dirichlet",
    ],
    meta_fields=["n_dofs_fine", "n_dofs_coarse"],
)
