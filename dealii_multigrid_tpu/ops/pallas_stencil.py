"""Pallas TPU kernel: sum-factorized patch Laplacian on the FLAT slot rows.

The XLA paths pay the (8, 128) tile on any [*, S, S] lattice view (4.7x at
S=33, RESULTS.md round-3c).  This kernel reads each patch as a [1, S^3] row
(lane-dense in HBM), reshapes INSIDE VMEM, and runs the nine axis GEMMs on
the MXU — HBM traffic is exactly 2 x NP x S^3 x 4 bytes.

Fallback rules: Mosaic may reject the in-VMEM (S^3,) -> (S, S^2)-style
reshapes on some toolchains; callers must treat `available()` as a runtime
probe (compile a tiny instance) and fall back to the XLA paths.

Status: prototype — semantics validated in interpreter mode on CPU
(tests/test_pallas_stencil.py); TPU lowering gated behind the probe.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

try:  # pallas is optional at import time (CPU test environments)
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    HAVE_PALLAS = True
except Exception:  # pragma: no cover
    HAVE_PALLAS = False


def _kernel(x_ref, ks_ref, ms_ref, scale_ref, o_ref, *, S: int):
    u = x_ref[0, :].reshape(S, S, S)
    KS = ks_ref[:]
    MS = ms_ref[:]

    def ax(v, mat, axis):
        # contract lattice axis `axis` with mat[S_out, S_in]
        return jnp.moveaxis(
            jax.lax.dot_general(
                mat, jnp.moveaxis(v, axis, 0).reshape(S, S * S),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).reshape(S, S, S),
            0, axis,
        )

    kx = ax(ax(ax(u, KS, 0), MS, 1), MS, 2)
    ky = ax(ax(ax(u, MS, 0), KS, 1), MS, 2)
    kz = ax(ax(ax(u, MS, 0), MS, 1), KS, 2)
    o_ref[0, :] = ((kx + ky + kz) * scale_ref[0, 0]).reshape(S * S * S)


@functools.partial(jax.jit, static_argnames=("S", "interpret"))
def patch_stencil_pallas(xp, KS, MS, pscale, S: int, interpret: bool = False):
    """[NP, S^3] patch rows -> stencil-applied rows (kx+ky+kz, scaled)."""
    NP = xp.shape[0]
    grid_spec = pl.GridSpec(
        grid=(NP,),
        in_specs=[
            pl.BlockSpec((1, S**3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((S, S), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((S, S), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (i, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, S**3), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
    )
    return pl.pallas_call(
        functools.partial(_kernel, S=S),
        out_shape=jax.ShapeDtypeStruct((NP, S**3), xp.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(xp, KS, MS, pscale.reshape(-1, 1))


_probe_cache: dict = {}

#: last probe failure per S, for remote diagnosis of Mosaic rejections
#: (the probe swallowing the error cost a round-trip in round 3)
probe_errors: dict = {}


def available(S: int) -> bool:
    """Can Mosaic lower the kernel at this S on the current backend?"""
    if not HAVE_PALLAS:
        return False
    if S in _probe_cache:
        return _probe_cache[S]
    try:
        x = jnp.zeros((1, S**3), jnp.float32)
        m = jnp.zeros((S, S), jnp.float32)
        s = jnp.zeros((1,), jnp.float32)
        np.asarray(patch_stencil_pallas(x, m, m, s, S))
        _probe_cache[S] = True
    except Exception as e:
        probe_errors[S] = f"{type(e).__name__}: {e}"
        _probe_cache[S] = False
    return _probe_cache[S]
