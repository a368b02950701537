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

# glibc returns every >128 KB allocation to the OS on free (mmap/munmap), so
# each volume-sized NumPy temporary pays ~15 ns/byte in page faults on this
# host — measured 3.7 s for a 240 MB elementwise op vs 0.05 s into
# preallocated memory.  Keep freed arena memory resident so temporaries
# recycle already-faulted pages (M_MMAP_THRESHOLD=-3, M_TRIM_THRESHOLD=-1).
try:
    import ctypes as _ctypes

    _libc = _ctypes.CDLL(None)
    _libc.mallopt(-3, 1 << 30)          # M_MMAP_THRESHOLD: 1 GB
    _libc.mallopt(-1, 0x7FFFFFFF)       # M_TRIM_THRESHOLD: never trim
except Exception:  # pragma: no cover - non-glibc platforms
    pass

# Transparent huge pages cut the first-touch fault count 512x (the faults
# themselves are ~60 us VM exits here); best-effort, needs root.  A
# system-wide persistent kernel-policy change does not belong in a library
# import (ADVICE r3): opt in with MGTPU_THP=1 (the bench/CLI entry points
# do), or set it once via enable_transparent_hugepages().


def enable_transparent_hugepages() -> bool:
    """Best-effort `echo always > .../transparent_hugepage/enabled`.
    Returns True if THP is (now) set to always."""
    try:
        with open("/sys/kernel/mm/transparent_hugepage/enabled", "r+") as f:
            if "[always]" in f.read():
                return True
            f.write("always")
            f.seek(0)
            return "[always]" in f.read()
    except Exception:  # no permission / not Linux
        return False


if _os.environ.get("MGTPU_THP", "") == "1":
    enable_transparent_hugepages()

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
