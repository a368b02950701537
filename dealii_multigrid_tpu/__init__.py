"""dealii_multigrid_tpu — a TPU-native (JAX/XLA/Pallas) framework for distributed,
matrix-free multigrid solvers on locally refined adaptive hexahedral meshes.

Re-designed from scratch with the capability surface of the reference benchmark
suite (peterrum/dealii-multigrid, the artifact of arXiv:2203.12292): matrix-free
sum-factorized/GEMM operator evaluation of Poisson on Q_p elements with
hanging-node + Dirichlet constraints, hybrid multigrid hierarchies (h local
smoothing / h global coarsening / p / hp), Chebyshev-Jacobi smoothers, pluggable
coarse solvers, mixed precision, distributed adaptive meshes with repartitioning
policies, partitioning-quality metrics, and a reproducible JSON-config benchmark
harness.

Design stance (TPU-first, NOT a port):
  * Host-side setup (NumPy) produces static flat index arrays: cell->dof gather
    maps, constraint tables, transfer tables.  No pointer-chasing on device.
  * Device-side compute is pure jitted functions over SoA arrays.  The hot
    operator apply is `gather -> batched cell GEMM (shared Cartesian element
    matrix on the MXU) -> scatter-add`, instead of the reference's SIMD
    sum-factorized cell loop (reference: include/operator.h).
  * Parallelism is jax.sharding over a device Mesh with XLA collectives
    (reference: MPI + p4est partitions).
"""

__version__ = "0.1.0"

import os as _os

import jax as _jax

# Persistent compilation cache: the axon TPU plugin compiles remotely and
# slowly; caching executables on disk makes every run after the first fast.
_cache_dir = _os.environ.get(
    "DEALII_MG_TPU_JAX_CACHE", _os.path.join(_os.path.dirname(__file__), "..", ".jax_cache")
)
try:
    _jax.config.update("jax_compilation_cache_dir", _os.path.abspath(_cache_dir))
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:  # pragma: no cover - older jax
    pass
