"""Spectral clamp on the AMG Jacobi smoother weights (round-4i fix).

Weighted Jacobi diverges when omega >= 2 / lambda_max(D^-1 A); the
boomer-analog's aggressive double-aggregation Galerkin hierarchy pushed
lambda_max past 2/0.9 at r=6 truncated HPMG and NaN'd the solve
(RESULTS.md round-4i).  build_amg now clamps each level's weight to
min(omega, 1.8 / lam_est) via a power-iteration estimate
(solvers/amg.py::_lam_max_dinv_a).  These tests pin (a) the estimator's
accuracy window and (b) the safety property itself: where the nominal
weight's iteration matrix has spectral radius > 1, the clamped weight's
is < 1.
"""

import numpy as np
import scipy.sparse as sp

from dealii_multigrid_tpu.solvers import amg as AMG


def _lap2d(n: int) -> sp.csr_matrix:
    e = np.ones(n)
    T = sp.diags([-e, 2.0 * e, -e], [-1, 0, 1], (n, n))
    eye = sp.identity(n)
    return (sp.kron(eye, T) + sp.kron(T, eye)).tocsr()


def _scaled_eigs(A: sp.csr_matrix) -> np.ndarray:
    """Eigenvalues of D^-1 A (via the similar SPD D^-1/2 A D^-1/2)."""
    d = A.diagonal()
    Dm = sp.diags(1.0 / np.sqrt(d))
    return np.linalg.eigvalsh((Dm @ A @ Dm).toarray())


def test_lam_max_estimate_within_headroom():
    A = _lap2d(16)
    est = AMG._lam_max_dinv_a(A, A.diagonal())
    true = _scaled_eigs(A).max()
    # 12 power iterations + 5% headroom: never more than ~15% above the
    # true value, and not below it by more than the power-method slack.
    assert 0.95 * true <= est <= 1.15 * true, (est, true)


def test_clamp_restores_smoother_convergence():
    """omega=1.5 on the 2D Laplacian (lambda_max(D^-1 A) ~ 2) is a
    divergent Jacobi weight; the clamp must pull every level back into
    the convergent regime while the unclamped weight provably diverges."""
    A = _lap2d(16)
    evs = _scaled_eigs(A)

    pre = AMG.build_amg(A, omega=1.5, coarse_size=40)
    om0 = pre.levels[0].omega
    assert om0 < 1.5, "clamp did not activate on the fine level"
    assert om0 * evs.max() < 2.0 * 1.01  # the spectral safety rule

    rho_nominal = np.max(np.abs(1.0 - 1.5 * evs))
    rho_clamped = np.max(np.abs(1.0 - om0 * evs))
    assert rho_nominal > 1.0  # the bug: nominal weight amplifies
    assert rho_clamped < 1.0  # the fix: clamped weight contracts

    # the same ten-sweep residual check the NaN blow-up failed: with the
    # clamped weight the Jacobi residual must not grow
    rng = np.random.default_rng(5)
    b = rng.normal(size=A.shape[0])
    x = np.zeros_like(b)
    dinv = 1.0 / A.diagonal()
    for _ in range(10):
        x = x + om0 * dinv * (b - A @ x)
    assert np.linalg.norm(b - A @ x) < np.linalg.norm(b)


def test_clamp_inactive_for_safe_nominal_weight():
    """The ML-analog default (2/3) is already safe on the Laplacian
    (lambda_max <= 2.7 rule): the clamp must leave it untouched, so the
    fix cannot perturb the flavours that were converging."""
    A = _lap2d(16)
    pre = AMG.build_amg(A, omega=2.0 / 3.0, coarse_size=40)
    assert pre.levels[0].omega == 2.0 / 3.0
