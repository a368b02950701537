"""Native smoothed-aggregation algebraic multigrid.

Capability mirror of the reference's Trilinos-ML / BoomerAMG usage
(multigrid_throughput.cc:975-1073): an algebraic preconditioner for the
assembled sparse system, used standalone ("AMG"/"AMGPETSc" solver types) or
as the multigrid coarse solver with n_cycles applications.

Setup runs on the host with SciPy (strength-of-connection filtering, greedy
aggregation, Jacobi-smoothed tentative prolongators, Galerkin triple
products); the apply is a jittable V-cycle over padded ELL sparse matrices
(gather + row-dot) with damped-Jacobi smoothing and a dense Cholesky on the
coarsest level.  ELL matvecs are irregular-gather bound on TPU — acceptable
for coarse solves and the standalone AMG benchmark rows, not the headline
path (see DESIGN.md).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp
from ..utils.device import to_device


@dataclass(frozen=True)
class ELLMatrix:
    """Padded sparse rows: y[i] = sum_k vals[i,k] * x[idx[i,k]]."""

    idx: jax.Array   # i32 [n, K] (padded with 0)
    vals: jax.Array  # f [n, K] (padded with 0)
    shape: tuple

    def matvec(self, x: jax.Array) -> jax.Array:
        return (self.vals * x[self.idx]).sum(axis=1)

    def rmatvec(self, y: jax.Array) -> jax.Array:
        out = jnp.zeros(self.shape[1], y.dtype)
        contrib = self.vals * y[:, None]
        return out.at[self.idx.reshape(-1)].add(contrib.reshape(-1))


jax.tree_util.register_dataclass(
    ELLMatrix, data_fields=["idx", "vals"], meta_fields=["shape"]
)


def _to_ell(A: sp.csr_matrix, dtype) -> ELLMatrix:
    A = A.tocsr()
    counts = np.diff(A.indptr)
    K = max(int(counts.max()), 1)
    n = A.shape[0]
    idx = np.zeros((n, K), np.int32)
    vals = np.zeros((n, K))
    for k in range(K):
        has = counts > k
        pos = A.indptr[:-1][has] + k
        idx[has, k] = A.indices[pos]
        vals[has, k] = A.data[pos]
    return ELLMatrix(to_device(idx), to_device(vals, dtype), A.shape)


def _greedy_aggregate(S: sp.csr_matrix) -> np.ndarray:
    """Classic two-pass greedy aggregation on the strength graph."""
    n = S.shape[0]
    agg = np.full(n, -1, np.int64)
    indptr, indices = S.indptr, S.indices
    next_agg = 0
    # pass 1: roots with fully unaggregated neighbourhoods
    for i in range(n):
        if agg[i] >= 0:
            continue
        nb = indices[indptr[i] : indptr[i + 1]]
        if (agg[nb] >= 0).any():
            continue
        agg[i] = next_agg
        agg[nb] = next_agg
        next_agg += 1
    # pass 2: attach leftovers to a neighbouring aggregate (or make singleton)
    for i in range(n):
        if agg[i] >= 0:
            continue
        nb = indices[indptr[i] : indptr[i + 1]]
        hit = nb[agg[nb] >= 0]
        if len(hit):
            agg[i] = agg[hit[0]]
        else:
            agg[i] = next_agg
            next_agg += 1
    return agg


@dataclass(frozen=True)
class AMGLevel:
    A: ELLMatrix
    P: ELLMatrix | None       # prolongation to this (finer) level from coarser
    inv_diag: jax.Array
    omega: float


jax.tree_util.register_dataclass(
    AMGLevel, data_fields=["A", "P", "inv_diag"], meta_fields=["omega"]
)


@dataclass(frozen=True)
class AMGPreconditioner:
    """V-cycle smoothed-aggregation AMG (finest level first)."""

    levels: tuple
    chol: jax.Array           # dense Cholesky factor of the coarsest matrix
    n_cycles: int = 1
    n_smooth: int = 2

    def _smooth(self, lev: AMGLevel, x, b):
        for _ in range(self.n_smooth):
            x = x + lev.omega * lev.inv_diag * (b - lev.A.matvec(x))
        return x

    def _v(self, k, b):
        lev = self.levels[k]
        if k == len(self.levels) - 1:
            y = jax.scipy.linalg.solve_triangular(
                self.chol, b.astype(self.chol.dtype), lower=True
            )
            x = jax.scipy.linalg.solve_triangular(self.chol.T, y, lower=False)
            return x.astype(b.dtype)
        x = self._smooth(lev, jnp.zeros_like(b), b)
        r = b - lev.A.matvec(x)
        Pc = self.levels[k + 1].P
        bc = Pc.rmatvec(r)
        xc = self._v(k + 1, bc)
        x = x + Pc.matvec(xc)
        return self._smooth(lev, x, b)

    def vmult(self, b: jax.Array) -> jax.Array:
        x = self._v(0, b)
        for _ in range(self.n_cycles - 1):
            r = b - self.levels[0].A.matvec(x)
            x = x + self._v(0, r)
        return x

    __call__ = vmult


jax.tree_util.register_dataclass(
    AMGPreconditioner,
    data_fields=["levels", "chol"],
    meta_fields=["n_cycles", "n_smooth"],
)


def build_amg(
    A: sp.csr_matrix,
    dtype=jnp.float32,
    theta: float = 0.02,
    omega: float = 2.0 / 3.0,
    coarse_size: int = 800,
    max_levels: int = 12,
    n_cycles: int = 1,
) -> AMGPreconditioner:
    levels = []
    A = A.tocsr()
    P_for_level = None
    while True:
        d = A.diagonal()
        lev = AMGLevel(
            A=_to_ell(A, dtype),
            P=P_for_level,
            inv_diag=to_device(1.0 / np.where(d == 0, 1.0, d), dtype),
            omega=omega,
        )
        levels.append(lev)
        if A.shape[0] <= coarse_size or len(levels) >= max_levels:
            break
        # strength-of-connection filter
        absA = abs(A)
        scale = 1.0 / np.sqrt(np.maximum(d, 1e-300))
        S = sp.diags(scale) @ absA @ sp.diags(scale)
        S.data[S.data < theta] = 0.0
        S.eliminate_zeros()
        agg = _greedy_aggregate(S)
        n_agg = int(agg.max()) + 1
        if n_agg >= A.shape[0]:
            break
        P0 = sp.csr_matrix(
            (np.ones(A.shape[0]), (np.arange(A.shape[0]), agg)),
            shape=(A.shape[0], n_agg),
        )
        # Jacobi-smoothed prolongator
        Dinv = sp.diags(1.0 / np.where(d == 0, 1.0, d))
        P = (P0 - omega * (Dinv @ (A @ P0))).tocsr()
        A = (P.T @ A @ P).tocsr()
        P_for_level = _to_ell(P, dtype)
    # dense Cholesky on the coarsest level
    Ad = A.toarray()
    Ad += 1e-12 * np.eye(Ad.shape[0]) * max(Ad.diagonal().max(), 1.0)
    chol = np.linalg.cholesky(Ad)
    cd = jnp.float32 if dtype == jnp.bfloat16 else dtype
    return AMGPreconditioner(tuple(levels), to_device(chol, cd), n_cycles=n_cycles)
