"""Benchmark: matrix-free multigrid CG throughput on the reference's default
config family (HMG-global, quadrant mesh, Chebyshev(3), coarse direct/AMG,
rtol 1e-4 — reference scripts/default.json) at quadrant r=7/p=4
(17.55M DoF), the largest configuration whose setup fits the round budget.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "DoF/s", "vs_baseline": N}

Baseline: the repo north-star is >= 2 GDoF/s aggregate CG throughput
(n_dofs * n_iterations / solve_time) at p=4 on TPU v5p-32 (16 chips);
vs_baseline is measured single-chip throughput / (2e9 / 16) = x125 MDoF/s.
"""

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.abspath(__file__))
# Two copies: .jax_cache/ is the working-dir cache (gitignored, lost on a
# VM rotation); results/ is committed so the fallback survives rotations.
_LAST_GOOD = os.path.join(_REPO, ".jax_cache", "bench_last_good.json")
_LAST_GOOD_SEED = os.path.join(_REPO, "results", "bench_last_good_seed.json")


def _emit(out: dict) -> int:
    print(json.dumps(out))
    return 0


def _ab_overrides() -> list[str]:
    """MGTPU_* env knobs that change WHAT is measured (A/B experiments).

    A bench run under such a knob must not overwrite the last-good seed —
    round-4 lesson: the MGTPU_GC_HOST_LOOP=1 A/B run clobbered the seed
    with the losing variant's number.  MGTPU_THP only affects host setup
    speed, not the measured solve, so it is allowed."""
    benign = {"MGTPU_THP", "MGTPU_PLATFORM"}
    return sorted(k for k in os.environ
                  if k.startswith("MGTPU_") and k not in benign)


def _save_last_good(out: dict) -> None:
    knobs = _ab_overrides()
    if knobs:
        print(f"bench: A/B overrides {knobs} set; NOT updating the "
              "last-good seed", file=sys.stderr)
        return
    stamped = dict(out, captured_at=time.strftime("%Y-%m-%dT%H:%M:%SZ",
                                                  time.gmtime()))
    for path in (_LAST_GOOD, _LAST_GOOD_SEED):
        try:
            os.makedirs(os.path.dirname(path), exist_ok=True)
            with open(path, "w") as f:
                json.dump(stamped, f)
        except OSError:
            pass


def _emit_stale(reason: str) -> int:
    """The axon service can be down for hours at capture time (round-3
    outage cost the whole round's perf artifact).  Rather than rc=1, emit
    the last driver-visible measurement, clearly marked stale."""
    for path in (_LAST_GOOD, _LAST_GOOD_SEED):
        try:
            with open(path) as f:
                out = json.load(f)
            break
        except (OSError, ValueError):
            continue
    else:
        return _emit({
            "metric": "mg_cg_throughput_quadrant_p4_1chip",
            "value": 0.0, "unit": "DoF/s", "vs_baseline": 0.0,
            "stale": True, "error": reason,
        })
    out["stale"] = True
    out["stale_reason"] = reason
    return _emit(out)


def _backend_up(timeout_s: float = 240.0) -> bool:
    """Probe backend init in a subprocess (init failure can poison the
    process-wide backend cache; a hung tunnel needs a hard timeout)."""
    import subprocess

    code = ("import jax; jax.devices(); import jax.numpy as jnp; "
            "float((jnp.arange(8.0)**2).sum()); print('OK')")
    try:
        r = subprocess.run([sys.executable, "-c", code], timeout=timeout_s,
                           capture_output=True, text=True)
        return r.returncode == 0 and "OK" in r.stdout
    except subprocess.TimeoutExpired:
        return False


def _wait_for_backend(attempts: int = 5) -> bool:
    delay = 30.0
    for i in range(attempts):
        if _backend_up():
            return True
        print(f"bench: backend init attempt {i + 1}/{attempts} failed; "
              f"retrying in {delay:.0f}s", file=sys.stderr)
        time.sleep(delay)
        delay = min(delay * 2.0, 480.0)
    return False


def main() -> int:
    if not _wait_for_backend():
        return _emit_stale("backend init failed after retries "
                           "(axon service unavailable)")
    import jax

    import dealii_multigrid_tpu as _pkg

    _pkg.enable_transparent_hugepages()  # bench opts into the THP fault cut
    from dealii_multigrid_tpu import api
    from dealii_multigrid_tpu.mesh import generators
    from dealii_multigrid_tpu.utils.params import RunParameters

    params = RunParameters()
    params.type = "HMG-global"
    params.geometry_type = "quadrant"
    params.n_ref_global = 7
    params.fe_degree_fine = 4  # north-star config is p=4
    # f32 outer CG with full-precision (3-pass bf16) contractions matches the
    # double-outer iteration counts at rtol 1e-4 (see DESIGN.md); double stays
    # available for tighter tolerances.
    params.number_type = "float"
    params.mg_number_type = "float"
    params.mg_data.coarse_solver.type = "amg"
    params.mg_data.smoother.degree = 3
    params.mg_data.cg_normal.reltol = 1e-4
    params.mg_data.n_repetitions = 5

    t0 = time.time()
    mesh = generators.create(
        params.geometry_type, params.dim, params.n_ref_global, params.n_ref_local
    )
    result, problem, levels = api.solve_with_global_coarsening_hybrid(params, mesh)
    setup_time = time.time() - t0

    # second row: the reference's benchmarked precision instantiation
    # run<3,1,double,float> (multigrid_throughput.cc:2430-2433) — f64 outer
    # CG around the SAME f32 level hierarchy (NumberType=mixed).
    mixed = {}
    try:
        import jax.numpy as jnp

        from dealii_multigrid_tpu import api as _api
        from dealii_multigrid_tpu.models import poisson
        from dealii_multigrid_tpu.ops import hybrid as _hy
        from dealii_multigrid_tpu.ops.operator import make_operator
        from dealii_multigrid_tpu.solvers.multigrid import PreconditionMG

        jax.config.update("jax_enable_x64", True)
        fine = levels[-1]
        mixed_op = _api.MixedPrecisionOperator(fine.op)
        rhs64_op = _hy.make_hybrid_operator(
            fine.fmt, fine.hanging, dtype=jnp.float64
        )
        gop = make_operator(fine.dofh, fine.hanging, dtype=jnp.float64, device=False)
        _problem64, rhs64 = poisson.assemble_problem_hybrid(
            fine.dofh, fine.hanging, rhs64_op,
            _hy.cell_slot_table(fine.fmt), fine.fmt, gop,
            params.simulation_type,
        )
        res_m = _api.mg_solve(
            mixed_op,
            rhs64.astype(jnp.float64),
            PreconditionMG(result.mg, jnp.float64),
            params.mg_data,
            n_levels=result.n_levels,
            dot=True,
            n_dofs=fine.dofh.n_dofs,
        )
        mixed = {
            "mixed_throughput": res_m.throughput,
            "mixed_n_iterations": res_m.n_iterations,
            "mixed_converged": res_m.converged,
            "mixed_solve_time_s": res_m.time,
        }
    except Exception as e:  # pragma: no cover - keep the headline row alive
        mixed = {"mixed_error": f"{type(e).__name__}: {e}"}

    # third row: NumberType=df32 — the TPU-native double-single (f32x2)
    # outer CG (solvers/twofloat.py): the same double/float precision
    # boundary as the mixed row with NO emulated f64 on the device.
    df32 = {}
    try:
        import jax.numpy as jnp

        from dealii_multigrid_tpu import api as _api
        from dealii_multigrid_tpu.solvers import twofloat as _tf
        from dealii_multigrid_tpu.solvers.multigrid import PreconditionMG

        import numpy as np

        fine = levels[-1]
        # f64-accurate RHS pair when the mixed row built one; otherwise the
        # f32 RHS splits exactly as (rhs, 0)
        b_src = rhs64 if "mixed_throughput" in mixed else result.rhs_used
        b_pair = _tf.tf_split_f64_host(np.asarray(b_src, np.float64))
        res_d = _api.mg_solve(
            fine.op,
            b_pair,
            PreconditionMG(result.mg, jnp.float32),
            params.mg_data,
            n_levels=result.n_levels,
            dot=True,
            n_dofs=fine.dofh.n_dofs,
            df32=True,
        )
        df32 = {
            "df32_throughput": res_d.throughput,
            "df32_n_iterations": res_d.n_iterations,
            "df32_converged": res_d.converged,
            "df32_solve_time_s": res_d.time,
        }
    except Exception as e:  # pragma: no cover - keep the headline row alive
        df32 = {"df32_error": f"{type(e).__name__}: {e}"}

    per_chip_baseline = 2.0e9 / 16.0
    out = {
        "metric": "mg_cg_throughput_quadrant_p4_1chip",
        "value": result.throughput,
        "unit": "DoF/s",
        "vs_baseline": result.throughput / per_chip_baseline,
        "n_dofs": result.n_dofs,
        "n_iterations": result.n_iterations,
        "converged": result.converged,
        "solve_time_s": result.time,
        "setup_time_s": setup_time,
        "n_levels": result.n_levels,
        "device": str(jax.devices()[0].device_kind),
        **mixed,
        **df32,
    }
    _save_last_good(out)
    return _emit(out)


if __name__ == "__main__":
    try:
        sys.exit(main())
    except Exception as exc:  # TPU lost mid-measurement: degrade, don't rc=1
        import traceback

        traceback.print_exc()
        sys.exit(_emit_stale(f"measurement failed: {type(exc).__name__}: {exc}"))
