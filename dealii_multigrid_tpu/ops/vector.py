"""Vector-valued (n_components > 1) constrained Laplace operator.

The Stokes / mantle-convection building block.  The reference DECLARES but
stubs this case (include/operator.h:396-406: ``n_components > 1``
``AssertThrow(false)``; FESystem at multigrid_throughput.cc:2262-2279), so a
working vector operator is parity-plus for the framework.

TPU-first layout: component-major ``[n_components, n]`` — each component is
a contiguous scalar field, so the scalar engines (gather or hybrid patch)
apply unchanged per component via ``jax.vmap``; constraints (hanging +
Dirichlet) act identically on every component, exactly the semantics of a
deal.II FESystem of ``n_components`` copies of FE_Q(p) with
component-independent constraints.  The cell kernel is the block-diagonal
vector Laplacian ∫ ∇u_c · ∇v_c per component — the viscous block of the
Stokes operator in nsinker-type benchmarks (mantle-convection/README.md).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class VectorOperator:
    """n_components copies of a scalar constrained operator.

    ``scalar`` is any operator pytree with vmult/dot (ops/operator.py
    LaplaceOperator or ops/hybrid.py HybridOperator); vectors are
    ``[n_components, n]``.
    """

    scalar: object
    n_components: int

    @property
    def dtype(self):
        return self.scalar.dtype

    @property
    def n_dofs(self) -> int:
        return self.n_components * self.scalar.n_dofs

    def new_vector(self) -> jax.Array:
        return jnp.zeros((self.n_components, self.scalar.n_slots), self.dtype)

    def vmult(self, u: jax.Array) -> jax.Array:
        return jax.vmap(self.scalar.vmult)(u)

    Tvmult = vmult

    def dot(self, x: jax.Array, y: jax.Array) -> jax.Array:
        return jax.vmap(self.scalar.dot)(x, y).sum()


jax.tree_util.register_dataclass(
    VectorOperator, data_fields=["scalar"], meta_fields=["n_components"]
)


def make_vector_operator(scalar_op, n_components: int) -> VectorOperator:
    return VectorOperator(scalar_op, n_components)


@dataclass(frozen=True)
class VectorPreconditioner:
    """Apply a scalar preconditioner (e.g. PreconditionMG over the scalar
    hierarchy) component-wise — the block-diagonal preconditioner of the
    vector Laplacian (each component's system is the scalar system)."""

    scalar: object

    def vmult(self, b: jax.Array) -> jax.Array:
        return jax.vmap(self.scalar.vmult)(b)

    __call__ = vmult


jax.tree_util.register_dataclass(
    VectorPreconditioner, data_fields=["scalar"], meta_fields=[]
)
