"""Variable-viscosity Stokes: the n-sinker benchmark family.

The reference repository points its mantle-convection workload at the
nsinker benchmark (mantle-convection/README.md:1-25 — n high-viscosity
spherical inclusions sinking in a low-viscosity medium); this module makes
it runnable on the framework's own pieces:

  * viscous block: the cellwise-constant-coefficient vector Laplacian —
    ``ops/operator.py::make_operator(cell_weights=eta)`` scales each cell's
    exact stiffness contribution (exact for piecewise-constant viscosity);
  * GMG hierarchy: RE-DISCRETIZED per level — the analytic viscosity field
    is sampled at each level mesh's own cell centers (the standard
    rediscretization approach; no Galerkin triple products needed);
  * Schur approximation: the 1/eta-WEIGHTED pressure mass (spectrally
    equivalent to the Schur complement under variable viscosity,
    Elman/Silvester/Wathen ch. 8), applied by the same fixed-interval
    Chebyshev — the Wathen element-wise eigenvalue bounds [1/8, 27/8] for
    D^{-1} M are weight-invariant (each row's lumped/diagonal ratio is a
    weighted mean of per-element ratios);
  * outer solve: right-preconditioned GMRES with the block upper-triangular
    preconditioner (solvers/gmres.py, models/stokes.py).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..mesh.dof import distribute_dofs, make_hanging_node_constraints
from ..mesh.octree import AdaptiveMesh
from ..ops.operator import compute_diagonal, make_operator
from ..ops.vector import VectorOperator
from ..utils.device import to_device
from .stokes import (
    StokesBlockPreconditioner,
    StokesOperator,
    _to_ell,
    assemble_divergence,
    assemble_pressure_mass,
    make_mass_solve,
)


def nsinker_viscosity(
    n_sinkers: int = 4,
    eta_min: float = 1.0,
    eta_max: float = 1e3,
    radius: float = 0.7,
    delta: float = 50.0,
    seed: int = 0,
):
    """Smoothed n-sinker viscosity field on [-1, 1]^3 (the pTatin/May
    benchmark shape): eta = eta_max inside the inclusions, eta_min outside,
    with an exp-smoothed transition of decay rate ``delta``."""
    rng = np.random.default_rng(seed)
    centers = rng.uniform(-0.55, 0.55, size=(n_sinkers, 3))

    def eta(x: np.ndarray) -> np.ndarray:
        x = np.asarray(x, np.float64)
        m = np.ones(x.shape[0])
        for c in centers:
            d = np.linalg.norm(x - c[None, :], axis=1)
            m *= 1.0 - np.exp(-delta * np.maximum(0.0, d - radius / 2.0) ** 2)
        return eta_min * m + eta_max * (1.0 - m)

    eta.centers = centers
    return eta


def make_stokes_rebuilder(mesh: AdaptiveMesh, mg_data, dtype=jnp.float64):
    """Geometry setup once, viscosity swap per call: returns
    ``rebuild(eta_fine) -> (op, block_precond)`` for loops whose viscosity
    changes every step (temperature-dependent rheology in the convection
    demo).  All pytree STRUCTURES are identical across calls, so every
    jitted program (solve, eigenvalue estimation) compiles once on the
    first call and is reused for all later viscosity fields."""
    from .. import api
    from ..mesh.coarsening import geometric_coarsening_sequence
    from ..solvers.multigrid import PreconditionMG

    assert mesh.dim == 3
    dofh_v = distribute_dofs(mesh, 2)
    dofh_p = distribute_dofs(mesh, 1)
    assert make_hanging_node_constraints(dofh_v).n_slaves == 0

    tri_seq = geometric_coarsening_sequence(mesh)
    plan = api.gc_level_plan("HMG-global", tri_seq, 2)
    geo = []
    for m, d in plan:
        dofh = distribute_dofs(m, d)
        hanging = make_hanging_node_constraints(dofh)
        geo.append((m, d, dofh, hanging))

    B = assemble_divergence(dofh_v, dofh_p)
    B_ell = _to_ell(B, dtype)
    Bt_ell = _to_ell(B.T.tocsr(), dtype)
    keep1 = np.ones(dofh_v.n_dofs)
    keep1[dofh_v.boundary_mask] = 0.0
    keep_v = to_device(np.tile(keep1, 3), dtype)

    def rebuild(eta_fine: np.ndarray):
        eta_fine = np.asarray(eta_fine, np.float64)
        etas = [eta_fine]
        for _ in range(len(plan) - 1):
            etas.append(etas[-1].reshape(-1, 8).mean(1))
        etas = etas[::-1]
        levels = []
        for (m, d, dofh, hanging), ec in zip(geo, etas):
            op = make_operator(
                dofh, hanging, dtype=dtype, cell_weights=ec
            )
            inv_diag = to_device(
                1.0 / compute_diagonal(dofh, hanging, cell_weights=ec),
                dtype=dtype,
            )
            levels.append(api.LevelContext(m, d, dofh, hanging, op, inv_diag))
        mg, _ = api.build_gc_preconditioner(levels, mg_data, dtype, dtype)
        op = StokesOperator(
            a_op=VectorOperator(levels[-1].op, 3),
            B=B_ell, Bt=Bt_ell, keep_v=keep_v,
            n_v=dofh_v.n_dofs, n_p=dofh_p.n_dofs,
        )
        precond = StokesBlockPreconditioner(
            v_precond=PreconditionMG(mg, dtype),
            p_solve=make_mass_solve(
                assemble_pressure_mass(dofh_p, cell_weights=1.0 / eta_fine),
                dtype,
            ),
            n_v=dofh_v.n_dofs, n_p=dofh_p.n_dofs,
        )
        return op, precond

    rebuild.dofh_v = dofh_v
    rebuild.dofh_p = dofh_p
    return rebuild


def build_stokes_nsinker(
    mesh: AdaptiveMesh, mg_data, viscosity, dtype=jnp.float64
):
    """Q2-Q1 Taylor-Hood Stokes with cellwise viscosity ``viscosity``
    (callable: [n, 3] centers -> [n] eta).  Mirrors stokes.build_stokes;
    returns (op, block_preconditioner, aux)."""
    from .. import api
    from ..mesh.coarsening import geometric_coarsening_sequence
    from ..solvers.multigrid import PreconditionMG

    assert mesh.dim == 3
    dofh_v = distribute_dofs(mesh, 2)
    dofh_p = distribute_dofs(mesh, 1)
    hang_v = make_hanging_node_constraints(dofh_v)
    assert hang_v.n_slaves == 0, "nsinker slice: uniform (conforming) mesh"

    # velocity GMG hierarchy with volume-AVERAGED viscosity coarsening:
    # arithmetic 8-to-1 averaging of the fine field down the hierarchy
    # beats point re-sampling ~1.6-2x in outer iterations at contrast
    # 1e3-1e4 (measured, RESULTS.md round-3d; harmonic averaging loses the
    # stiff inclusions entirely and diverges at 1e4).  The uniform
    # hypercube's Morton order makes children the 8 consecutive cells of
    # each parent (asserted).
    tri_seq = geometric_coarsening_sequence(mesh)
    plan = api.gc_level_plan("HMG-global", tri_seq, 2)
    eta_ladder = [np.asarray(viscosity(mesh.centers()), np.float64)]
    for lvl in range(len(plan) - 1):
        fine_c = plan[len(plan) - 1 - lvl][0].centers()
        coarse_c = plan[len(plan) - 2 - lvl][0].centers()
        assert np.allclose(
            fine_c.reshape(-1, 8, 3).mean(1), coarse_c, atol=1e-12
        ), "Morton 8-block/parent misalignment"
        eta_ladder.append(eta_ladder[-1].reshape(-1, 8).mean(1))
    eta_ladder = eta_ladder[::-1]  # coarsest first, aligned with plan
    levels = []
    for (m, d), eta_cells in zip(plan, eta_ladder):
        dofh = distribute_dofs(m, d)
        hanging = make_hanging_node_constraints(dofh)
        op = make_operator(dofh, hanging, dtype=dtype, cell_weights=eta_cells)
        inv_diag = to_device(
            1.0 / compute_diagonal(dofh, hanging, cell_weights=eta_cells),
            dtype=dtype,
        )
        levels.append(api.LevelContext(m, d, dofh, hanging, op, inv_diag))
    mg, _ = api.build_gc_preconditioner(levels, mg_data, dtype, dtype)
    v_precond = PreconditionMG(mg, dtype)
    a_op = VectorOperator(levels[-1].op, 3)

    B = assemble_divergence(dofh_v, dofh_p)
    keep1 = np.ones(dofh_v.n_dofs)
    keep1[dofh_v.boundary_mask] = 0.0
    keep_v = np.tile(keep1, 3)

    # Schur: 1/eta-weighted consistent pressure mass under the same
    # fixed-interval Chebyshev (bounds are weight-invariant)
    eta_fine = np.asarray(viscosity(mesh.centers()), np.float64)
    Mp = assemble_pressure_mass(dofh_p, cell_weights=1.0 / eta_fine)
    p_solve = make_mass_solve(Mp, dtype)

    op = StokesOperator(
        a_op=a_op,
        B=_to_ell(B, dtype),
        Bt=_to_ell(B.T.tocsr(), dtype),
        keep_v=to_device(keep_v, dtype),
        n_v=dofh_v.n_dofs,
        n_p=dofh_p.n_dofs,
    )
    precond = StokesBlockPreconditioner(
        v_precond=v_precond,
        p_solve=p_solve,
        n_v=dofh_v.n_dofs,
        n_p=dofh_p.n_dofs,
    )
    aux = {"dofh_v": dofh_v, "dofh_p": dofh_p, "B": B, "levels": levels,
           "eta_fine": eta_fine}
    return op, precond, aux
