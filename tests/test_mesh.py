"""Mesh layer tests: generators, 2:1 balance, coarsening (mesh/)."""

import numpy as np
import pytest

from dealii_multigrid_tpu.mesh import generators as G
from dealii_multigrid_tpu.mesh.coarsening import geometric_coarsening_sequence
from dealii_multigrid_tpu.mesh.octree import AdaptiveMesh


def check_balance(m: AdaptiveMesh):
    """No active cell may corner-touch an active cell >= 2 levels coarser."""
    offs = m._neighbor_offsets()
    for l in np.unique(m.level):
        coords = m.anchor[m.level == l]
        for off in offs:
            nb = coords + off
            valid = np.all((nb >= 0) & (nb < (1 << l)), axis=1)
            cov = m.covering_cell_level(int(l), nb[valid], int(l) - 1)
            bad = (cov >= 0) & (cov <= l - 2)
            assert not bad.any(), (l, off)


@pytest.mark.parametrize("r", [0, 1, 2, 3])
def test_hypercube_counts(r):
    m = G.create_hypercube(3, r)
    assert m.n_cells == 8**r
    assert m.n_global_levels == r + 1


@pytest.mark.parametrize("dim,r", [(2, 4), (3, 3), (3, 5)])
def test_quadrant_balanced(dim, r):
    m = G.create_quadrant(dim, r)
    check_balance(m)
    assert m.n_global_levels == r + 1
    # the negative quadrant is uniformly refined to level r
    finest = m.level == r
    assert finest.sum() == 2 ** (dim * (r - 1))


def test_quadrant_cell_counts_3d():
    # golden values pinned from this implementation (2:1 corner balance);
    # ratios grow ~8x as the refined octant dominates
    counts = [G.create_quadrant(3, r).n_cells for r in range(1, 6)]
    assert counts == [8, 15, 120, 701, 4712]


@pytest.mark.parametrize("geo,r", [("annulus", 5), ("circle", 5)])
def test_other_generators_balanced(geo, r):
    m = G.create(geo, 3, r)
    check_balance(m)
    assert m.n_cells > 8


def test_cells_cover_domain():
    m = G.create_quadrant(3, 4)
    vol = np.sum((1.0 / (1 << m.level.astype(np.int64))) ** 3)
    assert abs(vol - 1.0) < 1e-12


def test_morton_order_parent_contiguity():
    m = G.create_quadrant(3, 3)
    # z-order: children of one parent appear consecutively
    finest = np.nonzero(m.level == m.max_level)[0]
    parents = m.anchor[finest] >> 1
    # each group of 8 consecutive finest cells shares a parent
    assert len(finest) % 8 == 0


def test_geometric_coarsening_sequence():
    m = G.create_quadrant(3, 4)
    seq = geometric_coarsening_sequence(m)
    assert len(seq) == m.n_global_levels
    assert seq[-1] is m
    for k, mk in enumerate(seq):
        assert mk.max_level == k
        check_balance(mk)
        vol = np.sum((1.0 / (1 << mk.level.astype(np.int64))) ** 3)
        assert abs(vol - 1.0) < 1e-12
    # truncation controls: MinLevel is a minimum number of levels — keep from
    # the first tria with n_global_levels >= MinLevel; MinLevel takes priority
    # over MinNCells (reference multigrid_throughput.cc:2232-2253)
    seq2 = geometric_coarsening_sequence(m, min_level=2)
    assert seq2[0].max_level + 1 == 2
    seq3 = geometric_coarsening_sequence(m, min_n_cells=10)
    assert seq3[0].n_cells >= 10
    assert seq3[0].max_level == next(
        mm for mm in seq if mm.n_cells >= 10
    ).max_level
    seq4 = geometric_coarsening_sequence(m, min_level=2, min_n_cells=10**9)
    assert seq4[0].max_level + 1 == 2  # MinLevel wins over MinNCells


def test_covering_native_matches_numpy():
    """native/covering.cc vs the vectorised-NumPy fallback, random queries."""
    from dealii_multigrid_tpu.mesh import native

    if native.load() is None:
        pytest.skip("native library unavailable")
    m = G.create("quadrant", 3, 5, 0)
    rng = np.random.default_rng(7)
    for ql in range(1, m.max_level + 1):
        anchor = rng.integers(0, 1 << ql, size=(5000, 3))
        for top in (ql, ql - 1, max(ql - 3, 0)):
            fast = m.covering_cell_level(ql, anchor, top)
            orig = native.covering_cell_level_native
            try:
                native.covering_cell_level_native = lambda *a: None
                slow = m.covering_cell_level(ql, anchor, top)
            finally:
                native.covering_cell_level_native = orig
            assert np.array_equal(fast, slow), (ql, top)
