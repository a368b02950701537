"""Multigrid coarsening sequences.

Mirrors MGTransferGlobalCoarseningTools::create_geometric_coarsening_sequence
and create_polynomial_coarsening_sequence (reference usage:
multigrid_throughput.cc:1506-1510, 2219-2224) plus the coarse-end truncation
by MinLevel / MinNCells (multigrid_throughput.cc:2227-2260).
"""

from __future__ import annotations

from .octree import AdaptiveMesh


def geometric_coarsening_sequence(
    mesh: AdaptiveMesh,
    min_level: int = -1,
    min_n_cells: int = -1,
) -> list[AdaptiveMesh]:
    """All global-coarsening level meshes, coarsest first.

    Level k mesh = fine mesh with every cell of level > k replaced by its
    level-k ancestor.  Truncation: drop coarse levels below ``min_level`` or
    with fewer than ``min_n_cells`` cells (both from the JSON config).
    """
    seq = [mesh]
    while seq[-1].max_level > 0:
        seq.append(seq[-1].coarsened())
    seq = seq[::-1]  # coarsest first
    # level index of seq[i] is i + (n_global_levels - len(seq)) == i here
    keep = 0
    for i, m in enumerate(seq[:-1]):
        level = m.max_level
        if min_level >= 0 and level < min_level:
            keep = max(keep, i + 1)
        if min_n_cells >= 0 and m.n_cells < min_n_cells:
            keep = max(keep, i + 1)
    return seq[keep:]


def polynomial_coarsening_sequence(degree: int, kind: str = "bisect") -> list[int]:
    """Ascending degree sequence ending at ``degree``.

    bisect: p -> ceil(p/2) -> ... -> 1 (reference:
    PolynomialCoarseningSequenceType::bisect, multigrid_throughput.cc:1506-1510).
    """
    if kind == "bisect":
        seq = [degree]
        while seq[-1] > 1:
            seq.append((seq[-1] + 1) // 2)
        return seq[::-1]
    if kind == "go_to_one":
        return list(range(1, degree + 1))
    if kind == "decrease_by_one":
        return list(range(1, degree + 1))
    raise ValueError(f"unknown polynomial coarsening kind {kind!r}")
