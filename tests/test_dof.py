"""DoF enumeration + hanging-node constraint tests (mesh/dof.py)."""

import numpy as np
import pytest

from dealii_multigrid_tpu.mesh import generators as G
from dealii_multigrid_tpu.mesh import dof as D
from dealii_multigrid_tpu.mesh.dof import _active_lookup, local_node_indices
from dealii_multigrid_tpu.ops import tensor as T


@pytest.mark.parametrize("dim", [2, 3])
@pytest.mark.parametrize("p", [1, 2, 3])
def test_uniform_ndofs(dim, p):
    for r in (0, 1, 2):
        m = G.create_hypercube(dim, r)
        h = D.distribute_dofs(m, p)
        assert h.n_dofs == (p * 2**r + 1) ** dim
        assert h.boundary_mask.sum() == h.n_dofs - max(p * 2**r - 1, 0) ** dim


def _eval_cell(dofh, u, ci, xunit):
    p = dofh.degree
    gl = T.gauss_lobatto_points(p + 1)
    vals1d = [T.lagrange_values(gl, xunit[:, d]) for d in range(dofh.dim)]
    loc = local_node_indices(dofh.dim, p)
    Ns = np.ones((len(xunit), len(loc)))
    for d in range(dofh.dim):
        Ns *= vals1d[d][:, loc[:, d]]
    return Ns @ u[dofh.cell_dofs[ci]]


@pytest.mark.parametrize(
    "dim,p,geo,r",
    [(2, 1, "quadrant", 4), (2, 3, "quadrant", 4), (3, 1, "quadrant", 4),
     (3, 2, "quadrant", 4), (3, 4, "quadrant", 3), (3, 2, "circle", 5)],
)
def test_hanging_continuity(dim, p, geo, r):
    """A constraint-distributed coefficient vector must be continuous across
    every hanging interface (fine-side trace == coarse-side trace)."""
    m = G.create(geo, dim, r)
    h = D.distribute_dofs(m, p)
    c = D.make_hanging_node_constraints(h)
    rng = np.random.default_rng(0)
    u = rng.normal(size=h.n_dofs)
    u[c.slave] = (c.weights * u[c.masters]).sum(1)

    size = 1.0 / (1 << m.level.astype(np.int64))
    lo = m.anchor * size[:, None]
    hi = (m.anchor + 1) * size[:, None]
    find = _active_lookup(m)
    worst, nchecked = 0.0, 0
    for mlev in [int(x) for x in np.unique(m.level) if x >= 1]:
        cells = np.nonzero(m.level == mlev)[0]
        for d in range(dim):
            for side in (0, 1):
                a = m.anchor[cells]
                nb = a.copy()
                nb[:, d] += 2 * side - 1
                valid = (nb[:, d] >= 0) & (nb[:, d] < (1 << mlev))
                cov = np.full(len(cells), -1, np.int32)
                cov[valid] = m.covering_cell_level(mlev, nb[valid], mlev - 1)
                for k in np.nonzero(cov == mlev - 1)[0][:5]:
                    F = cells[k]
                    xs = rng.uniform(0, 1, size=(5, dim))
                    xs[:, d] = float(side)
                    vF = _eval_cell(h, u, F, xs)
                    C = find(mlev - 1, nb[k : k + 1] >> 1)[0]
                    X = lo[F] + xs * (hi[F] - lo[F])
                    xc = (X - lo[C]) / (hi[C] - lo[C])
                    vC = _eval_cell(h, u, C, xc)
                    worst = max(worst, np.abs(vF - vC).max())
                    nchecked += 1
    assert nchecked > 0
    assert worst < 1e-10


def test_constraints_closed():
    """After closure no master may itself be a slave."""
    m = G.create_quadrant(3, 4)
    h = D.distribute_dofs(m, 2)
    c = D.make_hanging_node_constraints(h)
    slave_set = set(c.slave.tolist())
    used = c.masters[c.weights != 0]
    assert not (set(used.tolist()) & slave_set)


def test_constraint_rows_partition_of_unity():
    """Interpolation rows of an affine function reproduce it: weights sum to 1."""
    m = G.create_quadrant(3, 3)
    h = D.distribute_dofs(m, 3)
    c = D.make_hanging_node_constraints(h)
    assert np.abs(c.weights.sum(1) - 1.0).max() < 1e-10
