"""Two-level transfer tests: adjointness and interpolation exactness."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from dealii_multigrid_tpu import api
from dealii_multigrid_tpu.mesh import generators as G
from dealii_multigrid_tpu.mesh.coarsening import geometric_coarsening_sequence
from dealii_multigrid_tpu.ops.transfer import make_two_level_transfer
from dealii_multigrid_tpu.ops.operator import distribute


def _build_pair(kind, p=2, r=3):
    m = G.create_quadrant(3, r)
    if kind == "h":
        seq = geometric_coarsening_sequence(m)
        fine = api.build_level(seq[-1], p, jnp.float64)
        coarse = api.build_level(seq[-2], p, jnp.float64)
    else:
        fine = api.build_level(m, p, jnp.float64)
        coarse = api.build_level(m, (p + 1) // 2 if p > 1 else 1, jnp.float64)
        if coarse.degree == fine.degree:
            coarse = api.build_level(m, 1, jnp.float64)
    tr = make_two_level_transfer(
        fine.dofh, coarse.dofh, fine.op, coarse.op, dtype=jnp.float64
    )
    return fine, coarse, tr


@pytest.mark.parametrize("kind", ["h", "p"])
def test_transfer_adjointness(kind):
    fine, coarse, tr = _build_pair(kind)
    rng = np.random.default_rng(1)
    uc = jnp.asarray(rng.normal(size=coarse.dofh.n_dofs))
    rf = jnp.asarray(rng.normal(size=fine.dofh.n_dofs))
    lhs = float(jnp.vdot(tr.prolong(uc), rf))
    rhs = float(jnp.vdot(uc, tr.restrict(rf)))
    assert abs(lhs - rhs) < 1e-9 * max(abs(lhs), 1.0)


@pytest.mark.parametrize("kind", ["h", "p"])
def test_prolongation_exact_interpolation(kind):
    """Prolongating the coarse interpolant of a degree-<=p_coarse polynomial
    reproduces its fine interpolant on all unconstrained fine DoFs."""
    fine, coarse, tr = _build_pair(kind)

    def f(x):
        # inside both spaces: multilinear polynomial
        return (1 + 2 * x[:, 0]) * (0.5 - x[:, 1]) * (x[:, 2] + 0.25)

    uc = jnp.asarray(f(coarse.dofh.points))
    uf_expect = np.asarray(f(fine.dofh.points))
    uf = np.asarray(tr.prolong(uc))
    mask = np.ones(fine.dofh.n_dofs, bool)
    mask[np.asarray(fine.op.constrained)] = False
    # prolongation zeroes coarse Dirichlet inputs (homogeneous MG subspace),
    # so exclude fine DoFs whose coarse interpolation stencil touches the
    # boundary — including through hanging-node constraint chains.
    excluded_c = coarse.dofh.boundary_mask.copy()
    ch = tr.coarse_hanging
    sl = np.asarray(ch.slave)
    if len(sl):
        bad = (excluded_c[np.asarray(ch.masters)] & (np.asarray(ch.weights) != 0)).any(1)
        excluded_c[sl[bad]] = True
    for b in tr.buckets:
        cdofs = np.asarray(tr.coarse_cell_dofs)[np.asarray(b.coarse_cells)]
        touches = excluded_c[cdofs].any(axis=1)
        fcells = np.asarray(b.fine_cells)[touches]
        mask[np.asarray(tr.fine_cell_dofs)[fcells].reshape(-1)] = False
    assert mask.sum() > 0
    err = np.abs(uf - uf_expect)[mask].max()
    assert err < 1e-11


def test_prolongation_zero_on_constrained():
    fine, coarse, tr = _build_pair("h")
    uc = jnp.ones(coarse.dofh.n_dofs, jnp.float64)
    uf = np.asarray(tr.prolong(uc))
    assert np.abs(uf[np.asarray(fine.op.constrained)]).max() == 0.0
