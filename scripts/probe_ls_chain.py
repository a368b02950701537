"""Same-session A/B: HMG-local solve, host-loop CG vs chunked-chain CG.

The LS V-cycle inside ANY multi-iteration while_loop program miscompiles
on the axon backend (CLAUDE.md gotchas; repro_while_miscompile.py), so LS
runs a host loop paying ~35 ms tunnel dispatch per CG iteration.  The
GC chain result (round-4d) showed the unrolled MASKED chain is a
different program shape that compiles correctly at bench scale — this
probe tries it on LS.  Safe: mg_solve's floor-aware recomputed-residual
guard raises on a miscompiled solve instead of returning it, which this
script catches and reports as a measured reason.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/probe_ls_chain.py [r] [p] [k0]
"""

import os

if os.environ.get("MGTPU_PLATFORM"):  # CPU smoke-testing
    import jax as _jax_platform_shim

    _jax_platform_shim.config.update(
        "jax_platforms", os.environ["MGTPU_PLATFORM"]
    )

import sys
import time


def main():
    r = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    p = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    k0 = sys.argv[3] if len(sys.argv) > 3 else "4"

    from dealii_multigrid_tpu import api
    from dealii_multigrid_tpu.mesh import generators
    from dealii_multigrid_tpu.utils.params import RunParameters

    params = RunParameters()
    params.type = "HMG-local"
    params.geometry_type = "quadrant"
    params.n_ref_global = r
    params.degree = p
    params.number_type = "float"
    params.mg_number_type = "float"
    params.mg_data.coarse_solver.type = "amg"

    mesh = generators.create("quadrant", 3, r, 0)

    # baseline arm sets "0" EXPLICITLY (0 = host loop on accelerators):
    # popping the env var falls back to DEFAULT_POLICY, which already ships
    # a chain value — the round-4 "host-loop" arm silently measured chain
    # k0=4 (advisor finding), so the arms must pin their values.
    for mode, env in (("host-loop", "0"), (f"chain k0={k0}", k0)):
        os.environ["MGTPU_LS_CHAIN"] = env
        t0 = time.time()
        try:
            res, _, _ = api.solve_with_local_smoothing_hybrid(params, mesh)
        except RuntimeError as e:
            print(f"{mode:12s} GUARD RAISED: {e}", flush=True)
            continue
        print(
            f"{mode:12s} its={res.n_iterations} converged={res.converged} "
            f"solve={res.time:.4f}s thpt={res.throughput/1e6:.1f} MDoF/s "
            f"(total {time.time()-t0:.0f}s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
