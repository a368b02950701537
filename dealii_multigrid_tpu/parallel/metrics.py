"""Partitioning-quality metrics for multigrid hierarchies.

Capability mirror of the reference's MGTools (include/mg_tools.h): workload
per level/shard, workload efficiency, max workload path, vertical and
horizontal communication efficiency, memory consumption.  The reference
resolves cross-level ownership with an MPI consensus algorithm
(mg_tools.h:115-189); here partitions are static host arrays, so everything
reduces to vectorised NumPy over cell->shard maps.
"""

from __future__ import annotations

import numpy as np

from ..mesh.octree import AdaptiveMesh, morton_encode


def block_partition(n_cells: int, n_shards: int) -> np.ndarray:
    """Morton-order block partition (the default space-filling-curve
    partition, p4est-style): cell i -> shard floor(i * n_shards / n_cells)."""
    return (np.arange(n_cells, dtype=np.int64) * n_shards // max(n_cells, 1)).astype(
        np.int32
    )


def workload(levels: list[AdaptiveMesh], partitions: list[np.ndarray], n_shards: int):
    """Cells per (level, shard) — reference mg_tools.h:39-79."""
    out = np.zeros((len(levels), n_shards), dtype=np.int64)
    for l, (m, part) in enumerate(zip(levels, partitions)):
        out[l] = np.bincount(part, minlength=n_shards)
    return out


def workload_efficiency(
    levels: list[AdaptiveMesh], partitions: list[np.ndarray], n_shards: int
) -> float:
    """sum_l ideal / sum_l max_shard (reference mg_tools.h:10-36)."""
    w = workload(levels, partitions, n_shards)
    ideal = w.sum(axis=1) / n_shards
    path_max = w.max(axis=1).sum()
    return float(ideal.sum() / path_max) if path_max else 1.0


def workload_path_max(
    levels: list[AdaptiveMesh], partitions: list[np.ndarray], n_shards: int
) -> float:
    return float(workload(levels, partitions, n_shards).max(axis=1).sum())


def vertical_communication_efficiency(
    levels: list[AdaptiveMesh], partitions: list[np.ndarray], n_shards: int
) -> float:
    """Fraction of fine cells whose coarse parent lives on the same shard
    (reference mg_tools.h:81-189: parent/child on same vs different rank)."""
    same = 0
    total = 0
    for l in range(1, len(levels)):
        fine, coarse = levels[l], levels[l - 1]
        pf, pc = partitions[l], partitions[l - 1]
        # map each fine cell to its coarse cell (identity or parent)
        idx = {}
        for lev in np.unique(coarse.level):
            sel = np.nonzero(coarse.level == lev)[0]
            codes = morton_encode(coarse.anchor[sel])
            order = np.argsort(codes)
            idx[int(lev)] = (codes[order], sel[order])

        def find(lev, anchors):
            codes_sorted, gidx = idx.get(int(lev), (np.zeros(0, np.uint64), None))
            if gidx is None or len(codes_sorted) == 0:
                return np.full(len(anchors), -1, np.int64)
            q = morton_encode(anchors)
            pos = np.minimum(np.searchsorted(codes_sorted, q), len(codes_sorted) - 1)
            return np.where(codes_sorted[pos] == q, gidx[pos], -1)

        src = np.full(fine.n_cells, -1, np.int64)
        for lev in np.unique(fine.level):
            sel = np.nonzero(fine.level == lev)[0]
            hit = find(lev, fine.anchor[sel])
            src[sel] = hit
            miss = sel[hit < 0]
            if len(miss):
                src[miss] = find(lev - 1, fine.anchor[miss] >> 1)
        ok = src >= 0
        same += int((pf[ok] == pc[src[ok]]).sum())
        total += int(ok.sum())
    return same / total if total else 1.0


def horizontal_communication_efficiency(
    levels: list[AdaptiveMesh], partitions: list[np.ndarray], n_shards: int
) -> float:
    """owned / (owned + ghost) cells, averaged over levels
    (reference mg_tools.h:191-233).  Ghosts: cells adjacent (26-neighbourhood)
    to cells of another shard."""
    ratios = []
    for m, part in zip(levels, partitions):
        offs = m._neighbor_offsets()
        ghost = 0
        index = m.active_index()
        for lev in np.unique(m.level):
            sel = np.nonzero(m.level == lev)[0]
            coords = m.anchor[sel]
            is_ghost = np.zeros(len(sel), dtype=bool)
            for off in offs:
                nb = coords + off
                valid = np.all((nb >= 0) & (nb < (1 << lev)), axis=1)
                cov = m.covering_cell_level(int(lev), nb[valid], int(lev))
                vidx = np.nonzero(valid)[0]
                hit = cov == lev
                if not hit.any():
                    continue
                codes_sorted, gidx = index[int(lev)]
                q = morton_encode(nb[valid][hit])
                pos = np.searchsorted(codes_sorted, q)
                other = part[gidx[pos]]
                is_ghost[vidx[hit]] |= other != part[sel[vidx[hit]]]
            ghost += int(is_ghost.sum())
        ratios.append(m.n_cells / (m.n_cells + ghost) if m.n_cells else 1.0)
    return float(np.mean(ratios)) if ratios else 1.0


def memory_consumption(levels: list[AdaptiveMesh], degree: int, bytes_per_dof: int = 4):
    """Rough per-level memory model (reference mg_tools.h:235-257)."""
    total = 0
    for m in levels:
        nloc = (degree + 1) ** m.dim
        total += m.n_cells * nloc * bytes_per_dof  # cell arrays
    return total


def multigrid_statistics(
    levels: list[AdaptiveMesh],
    n_shards: int,
    degree: int,
    partitions: list[np.ndarray] | None = None,
) -> dict:
    """The summary row of reference MGTools::print_multigrid_statistics
    (mg_tools.h:267-512)."""
    if partitions is None:
        partitions = [block_partition(m.n_cells, n_shards) for m in levels]
    return {
        "workload_eff": workload_efficiency(levels, partitions, n_shards),
        "workload_path_max": workload_path_max(levels, partitions, n_shards),
        "vertical_eff": vertical_communication_efficiency(levels, partitions, n_shards),
        "horizontal_eff": horizontal_communication_efficiency(
            levels, partitions, n_shards
        ),
        "mem_total": memory_consumption(levels, degree),
    }
