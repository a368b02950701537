"""Host -> device array transfer helper.

On the axon TPU backend, ``jnp.asarray(x, dtype)`` with a dtype CONVERSION
compiles a convert_element_type program per new shape (~0.4 s of remote
compile each; measured in round 3).  Setup-time construction creates
hundreds of distinct-shaped tables, so every host->device constant must be
converted with NumPy first and shipped with ``jax.device_put`` (a pure,
async transfer — no compilation).
"""

from __future__ import annotations

import jax
import numpy as np


def to_device(x, dtype=None) -> jax.Array:
    """np-convert (host) + device_put (no XLA compile), cf. module docstring."""
    a = np.asarray(x)
    if dtype is not None:
        nd = np.dtype(dtype)
        if a.dtype != nd:
            a = a.astype(nd)
    return jax.device_put(a)
