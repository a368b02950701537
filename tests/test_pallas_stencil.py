"""Pallas patch-stencil prototype == the XLA tensordot chain (interpreter)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dealii_multigrid_tpu.ops import pallas_stencil as ps

pytestmark = pytest.mark.skipif(
    not ps.HAVE_PALLAS, reason="pallas unavailable"
)


def _reference(xp, KS, MS, pscale, S):
    up = xp.reshape(-1, S, S, S)

    def ax(u, mat, axis):
        return jnp.moveaxis(
            jnp.tensordot(u, mat, axes=([axis], [1]),
                          precision=jax.lax.Precision.HIGHEST), -1, axis)

    kx = ax(ax(ax(up, KS, 1), MS, 2), MS, 3)
    ky = ax(ax(ax(up, MS, 1), KS, 2), MS, 3)
    kz = ax(ax(ax(up, MS, 1), MS, 2), KS, 3)
    return ((kx + ky + kz) * pscale[:, None, None, None]).reshape(xp.shape)


@pytest.mark.parametrize("S,NP", [(9, 4), (17, 3)])
def test_pallas_stencil_matches_reference(S, NP):
    rng = np.random.default_rng(0)
    xp = jnp.asarray(rng.standard_normal((NP, S**3)), jnp.float32)
    KS = jnp.asarray(rng.standard_normal((S, S)), jnp.float32)
    MS = jnp.asarray(rng.standard_normal((S, S)), jnp.float32)
    sc = jnp.asarray(rng.standard_normal(NP), jnp.float32)
    ref = np.asarray(_reference(xp, KS, MS, sc, S))
    out = np.asarray(ps.patch_stencil_pallas(xp, KS, MS, sc, S, interpret=True))
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-4 * np.abs(ref).max())
