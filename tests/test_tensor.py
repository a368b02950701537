"""1D FE table unit tests (ops/tensor.py)."""

import numpy as np
import pytest

from dealii_multigrid_tpu.ops import tensor as T


def test_gauss_lobatto_points():
    assert np.allclose(T.gauss_lobatto_points(2), [0, 1])
    assert np.allclose(T.gauss_lobatto_points(3), [0, 0.5, 1])
    p5 = T.gauss_lobatto_points(5)
    assert np.allclose(p5 + p5[::-1], 1.0)  # symmetric
    assert np.all(np.diff(p5) > 0)


@pytest.mark.parametrize("p", [1, 2, 3, 4, 5])
def test_partition_of_unity(p):
    B, D, q, w = T.shape_tables(p)
    assert np.abs(B.sum(1) - 1).max() < 1e-13
    assert np.abs(D.sum(1)).max() < 1e-12
    assert abs(w.sum() - 1.0) < 1e-14


def test_mass_stiffness_p1():
    assert np.allclose(T.mass_matrix_1d(1), [[1 / 3, 1 / 6], [1 / 6, 1 / 3]])
    assert np.allclose(T.stiffness_matrix_1d(1), [[1, -1], [-1, 1]])


@pytest.mark.parametrize("p", [1, 2, 3, 4])
def test_h_embedding_reproduces_polynomials(p):
    nodes = T.gauss_lobatto_points(p + 1)
    coeff = np.arange(p + 1) * 0.7 - 1.0
    u = np.polyval(coeff[: p + 1], nodes)
    E = T.h_embedding_1d(p)
    for c in (0, 1):
        x = 0.5 * (nodes + c)
        assert np.abs(E[c] @ u - np.polyval(coeff[: p + 1], x)).max() < 1e-12


@pytest.mark.parametrize("pc,pf", [(1, 2), (2, 4), (2, 3), (1, 4)])
def test_p_embedding(pc, pf):
    cn = T.gauss_lobatto_points(pc + 1)
    fn = T.gauss_lobatto_points(pf + 1)
    u = 2 * cn**pc - cn + 0.5
    E = T.p_embedding_1d(pc, pf)
    assert np.abs(E @ u - (2 * fn**pc - fn + 0.5)).max() < 1e-12


def test_stiffness_rowsum_zero():
    assert np.abs(T.stiffness_matrix_1d(4).sum(1)).max() < 1e-12
