"""TPU throughput rows for the Stokes / nsinker family (round-5 item 4).

Captures reference-protocol rows (warm-up + best-of-N with true device
fences, throughput = n_dofs * n_iterations / solve_time — the same metric
as multigrid_throughput.cc:1238-1283) for:

  * constant-viscosity Taylor-Hood Stokes, triangular GMRES
    (models/stokes.py::build_stokes + triangular_preconditioner);
  * nsinker variable viscosity at a given contrast, Galerkin velocity
    coarse operators + w-BFBT Schur (models/nsinker.py, the
    mantle-convection/README.md regime).

Both rows run the HOST-restart GMRES (gmres_solve_host: one jitted
program per A / M application) — the axon backend miscompiles the
V-cycle inside monolithic multi-iteration while_loop programs
(CLAUDE.md; repro_while_miscompile.py), and the host path plus
verify_true_residual is the guarded production protocol for
nonsymmetric solves.  The per-apply tunnel dispatch (~35 ms) is part of
the honest cost until a chain-shaped GMRES is staged.

Usage:
  PYTHONPATH=/root/repo:$PYTHONPATH python scripts/profile_stokes_tpu.py \
      [r] [contrast] [n_reps]
CPU smoke: MGTPU_PLATFORM=cpu python scripts/profile_stokes_tpu.py 2 1e2 1
"""

import os

if os.environ.get("MGTPU_PLATFORM"):  # CPU smoke-testing
    import jax as _jax_platform_shim

    _jax_platform_shim.config.update(
        "jax_platforms", os.environ["MGTPU_PLATFORM"]
    )

# dtype=jnp.float64 below is silently truncated to f32 without this (and
# the reltol=1e-8 rows would report converged while the true residual sits
# at ~1e-6/1e-4 — round-4 advisor HIGH finding).  Must run before any jnp
# array creation.
import jax as _jax_x64

_jax_x64.config.update("jax_enable_x64", True)

import sys
import time

import numpy as np


def _solve_row(tag, op, tri, b, m, reltol, maxiter, n_reps):
    import jax
    import jax.numpy as jnp

    from dealii_multigrid_tpu.solvers.gmres import (
        gmres_solve_host,
        verify_true_residual,
    )

    bj = jnp.asarray(b)
    n_dofs = int(b.shape[0])

    def run():
        t0 = time.perf_counter()
        res = gmres_solve_host(
            op, bj, preconditioner=tri, m=m,
            reltol=reltol, maxiter=maxiter,
        )
        jax.block_until_ready(res.x)
        return res, time.perf_counter() - t0

    res, t_warm = run()  # warm-up: compiles the apply programs
    best = min(run()[1] for _ in range(n_reps))
    its = int(res.n_iterations)
    tr = verify_true_residual(
        op, bj, res.x, res.residual_norm, reltol
    )
    rel_true = float(tr / np.linalg.norm(np.asarray(b)))
    # an in-solver "converged" that the recomputed residual contradicts by
    # >50x is a lie (precision truncation or miscompile) — fail the row
    # rather than publish it (round-4 advisor HIGH finding)
    converged = bool(res.converged) and rel_true <= 50.0 * reltol
    thr = n_dofs * its / best
    print(
        f"{tag}: n_dofs={n_dofs} its={its} converged={converged} "
        f"solve={best:.4f}s (warm-up {t_warm:.1f}s) "
        f"throughput={thr/1e6:.2f} MDoF/s true_rel_res={rel_true:.2e}",
        flush=True,
    )
    if not converged:
        print(f"{tag}: ROW FAILED — true relative residual {rel_true:.2e} "
              f"vs reltol {reltol:g}", flush=True)
    return thr


def main():
    r = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    contrast = float(sys.argv[2]) if len(sys.argv) > 2 else 1e4
    n_reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    import jax.numpy as jnp

    from dealii_multigrid_tpu.mesh import generators as G
    from dealii_multigrid_tpu.models import nsinker as NS
    from dealii_multigrid_tpu.models import stokes as ST
    from dealii_multigrid_tpu.utils.params import MultigridParameters

    mg = MultigridParameters()
    mg.smoother.degree = 3
    mg.coarse_solver.type = "amg"

    mesh = G.create("hypercube", 3, r, 0)
    rng = np.random.default_rng(0)

    # --- constant-viscosity Stokes, triangular GMRES -------------------
    t0 = time.perf_counter()
    op, block, aux = ST.build_stokes(mesh, mg, dtype=jnp.float64)
    tri = ST.triangular_preconditioner(op, block)
    print(f"stokes build: {time.perf_counter() - t0:.1f}s", flush=True)
    n_v, n_p = op.n_v, op.n_p
    b = rng.normal(size=3 * n_v + n_p)
    b[: 3 * n_v] *= np.asarray(op.keep_v)
    b[3 * n_v:] -= b[3 * n_v:].mean()
    _solve_row(f"stokes-const r={r}", op, tri, b, 30, 1e-8, 200, n_reps)

    # --- nsinker at the requested contrast -----------------------------
    t0 = time.perf_counter()
    visc = NS.nsinker_viscosity(n_sinkers=4, eta_max=contrast, seed=0)
    opn, blockn, auxn = NS.build_stokes_nsinker(
        mesh, mg, visc, coarsening="galerkin", schur="wbfbt",
    )
    trin = ST.triangular_preconditioner(opn, blockn)
    print(f"nsinker build: {time.perf_counter() - t0:.1f}s", flush=True)
    bn = rng.normal(size=3 * opn.n_v + opn.n_p)
    bn[: 3 * opn.n_v] *= np.asarray(opn.keep_v)
    bn[3 * opn.n_v:] -= bn[3 * opn.n_v:].mean()
    _solve_row(
        f"nsinker r={r} contrast={contrast:g}", opn, trin, bn,
        30, 1e-8, 300, n_reps,
    )


if __name__ == "__main__":
    main()
