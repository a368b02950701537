"""Multigrid V-cycle engine and preconditioner wrapper.

Capability mirror of deal.II's Multigrid + PreconditionMG as driven by the
reference's mg_solve (multigrid_throughput.cc:1093-1133): per-level Chebyshev
pre/post smoothing, residual restriction, pluggable coarse solver, optional
chaining (an entire Multigrid wrapped as the coarse solver of another — the
reference's two-object hp-local construction, multigrid_throughput.cc:1093-1124),
and mixed precision (outer solve dtype vs. level dtype, reference
multigrid_throughput.cc:528-550, 2430-2433).

TPU-first: the V-cycle is Python-unrolled over the (static) level hierarchy
into one jittable function — no host round-trips inside the preconditioner.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Sequence

import jax
import jax.numpy as jnp

from ..ops.operator import LaplaceOperator
from ..ops.transfer import TwoLevelTransfer
from .chebyshev import ChebyshevSmoother


@dataclass(frozen=True)
class Multigrid:
    """V(1,1)-cycle over a static level hierarchy (coarsest = index 0).

    A registered pytree: pass it as a jit ARGUMENT so the per-level tables
    stay runtime parameters instead of baked HLO constants (compile time!).
    """

    operators: tuple
    smoothers: tuple        # smoothers[0] unused (None)
    transfers: tuple        # transfers[l]: level l <-> l-1; transfers[0] None
    coarse_solve: object    # pytree object, called as coarse_solve(b)
    n_cycles: int = 1
    # T-state level visits (round-4j, MGTPU_TVCYCLE): each level whose
    # operator/smoother/transfer carry split (TVec) machinery runs its
    # whole visit in the split T layout — ONE to/from_ts pair per visit
    # instead of a boundary transpose around every smoother call, residual
    # vmult and transfer (~7 volume transposes per hot-level visit).
    use_state: bool = False

    def __post_init__(self):
        object.__setattr__(self, "operators", tuple(self.operators))
        object.__setattr__(self, "smoothers", tuple(self.smoothers))
        object.__setattr__(self, "transfers", tuple(self.transfers))

    @property
    def n_levels(self) -> int:
        return len(self.operators)

    def _level_state_ok(self, level: int) -> bool:
        """Static (trace-time) check that a level can run in split T state."""
        op = self.operators[level]
        sm = self.smoothers[level]
        tr = self.transfers[level]
        from ..ops.hybrid import TVec

        return (
            getattr(op, "tv", None) is not None
            and "split" in op.tv
            and getattr(tr, "tsx", None) is not None
            and isinstance(getattr(sm, "inv_diag_t", None), TVec)
        )

    def _v_cycle(self, level: int, b: jax.Array) -> jax.Array:
        if level == 0:
            return self.coarse_solve(b)
        sm = self.smoothers[level]
        op = self.operators[level]
        tr = self.transfers[level]
        if self.use_state and self._level_state_ok(level):
            bt = op._to_ts(b)
            xt = sm.vmult_state(bt)               # pre-smooth (zero guess)
            rt = bt - op._vmult_ts_core(xt)       # residual, split state
            bc = tr.restrict_ts(rt)               # restrict from T state
            xc = self._v_cycle(level - 1, bc)     # coarse correction
            xt = xt + tr.prolong_ts(xc)           # prolongate into T state
            xt = sm.step_state(xt, bt)            # post-smooth
            return op._from_ts(xt)
        x = sm.vmult(b)                       # pre-smooth (zero initial guess)
        r = b - op.vmult(x)                   # residual
        bc = tr.restrict(r)                   # restrict
        xc = self._v_cycle(level - 1, bc)     # coarse correction
        x = x + tr.prolong(xc)                # prolongate
        return sm.step(x, b)                  # post-smooth

    def vmult(self, b: jax.Array) -> jax.Array:
        """Apply as a preconditioner: n_cycles V-cycles from a zero guess."""
        x = self._v_cycle(self.n_levels - 1, b)
        for _ in range(self.n_cycles - 1):
            r = b - self.operators[-1].vmult(x)
            x = x + self._v_cycle(self.n_levels - 1, r)
        return x


jax.tree_util.register_dataclass(
    Multigrid,
    data_fields=["operators", "smoothers", "transfers", "coarse_solve"],
    meta_fields=["n_cycles", "use_state"],
)


@dataclass(frozen=True)
class PreconditionMG:
    """Precision boundary between the outer Krylov solve and the MG levels
    (reference: float MG levels under a double outer CG,
    multigrid_throughput.cc:528-550)."""

    mg: Multigrid
    outer_dtype: jnp.dtype

    def vmult(self, b: jax.Array) -> jax.Array:
        level_dtype = self.mg.operators[-1].dtype
        x = self.mg.vmult(b.astype(level_dtype))
        return x.astype(self.outer_dtype)


jax.tree_util.register_dataclass(
    PreconditionMG, data_fields=["mg"], meta_fields=["outer_dtype"]
)
