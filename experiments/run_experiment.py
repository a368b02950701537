#!/usr/bin/env python
"""Run one experiment end-to-end: generate its config sweep, drive every
config through the CLI runner, and leave a results artifact on disk.

This is the runnable analog of the reference's experiments-skx job files
(reference: experiments-skx/small-scaling-quadrant-0001.cmd,
large-scaling-create-job-files.py:63-74): there, SLURM launches
`mpirun ./multigrid_throughput input_*.json > output`; here, one process
drives the local TPU chip(s) and the cumulative ConvergenceTable is written
to the output file after EVERY config (crash-safe partial results).

Usage:
  python experiments/run_experiment.py small-scaling quadrant \
      [--out results/small-scaling-quadrant.txt] [--budget-s 1500] \
      [--max-ref 7]

The first argument names a generator in scripts/ (dashes or underscores);
remaining positional arguments are passed to the generator.  --max-ref
truncates the sweep (the single-chip analog of picking the job size by node
count); --budget-s stops between configs once the wall-clock budget is
spent.  Both truncations are recorded in the artifact, never silent.
"""

from __future__ import annotations

import argparse
import glob
import io
import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPTS = os.path.join(REPO, "scripts")


def main() -> int:
    # sweep entry point opts into THP (library import no longer sets it);
    # subprocess children inherit the policy, isolated runs re-apply via env
    os.environ.setdefault("MGTPU_THP", "1")
    try:
        import dealii_multigrid_tpu as _pkg

        _pkg.enable_transparent_hugepages()
    except Exception:
        pass
    ap = argparse.ArgumentParser()
    ap.add_argument("experiment", help="generator name, e.g. small-scaling")
    ap.add_argument("gen_args", nargs="*", help="arguments for the generator")
    ap.add_argument("--out", default=None, help="results file path")
    ap.add_argument("--budget-s", type=float, default=1800.0)
    ap.add_argument("--max-ref", type=int, default=None,
                    help="skip configs with NRefGlobal above this")
    ap.add_argument("--skip-n", type=int, default=0,
                    help="skip the first N generated configs (resume a "
                         "sweep that died partway; pair with a distinct "
                         "--out and merge the artifacts)")
    ap.add_argument("--isolate", action="store_true",
                    help="run every config in its own subprocess (survives "
                         "TPU worker crashes at the cost of per-config "
                         "process startup)")
    args = ap.parse_args()

    name = args.experiment
    gen = None
    for cand in (name, name.replace("-", "_"), name.replace("_", "-")):
        path = os.path.join(SCRIPTS, cand + ".py")
        if os.path.exists(path):
            gen = path
            break
    if gen is None:
        print(f"error: no generator scripts/{name}.py", file=sys.stderr)
        return 1

    out_path = args.out or os.path.join(
        REPO, "results", f"{os.path.basename(gen)[:-3]}.txt"
    )
    os.makedirs(os.path.dirname(out_path), exist_ok=True)

    t0 = time.time()
    with tempfile.TemporaryDirectory() as work:
        env = dict(os.environ)
        env["PYTHONPATH"] = SCRIPTS + os.pathsep + env.get("PYTHONPATH", "")
        subprocess.run(
            [sys.executable, gen, *args.gen_args], cwd=work, env=env, check=True
        )
        configs = sorted(glob.glob(os.path.join(work, "input_*.json")))
        if not configs:
            print("error: generator produced no configs", file=sys.stderr)
            return 1

        sys.path.insert(0, REPO)
        # MGTPU_PLATFORM=cpu runs the experiment on the CPU backend (CI /
        # no-TPU hosts).  The axon plugin ignores JAX_PLATFORMS, so the
        # platform must be forced through jax.config BEFORE backend init.
        if os.environ.get("MGTPU_PLATFORM"):
            import jax

            jax.config.update("jax_platforms", os.environ["MGTPU_PLATFORM"])
        from dealii_multigrid_tpu import cli
        from dealii_multigrid_tpu.utils.params import RunParameters
        from dealii_multigrid_tpu.utils.table import ConvergenceTable

        parsed = [(c, RunParameters.parse(c)) for c in configs]
        if any(
            p.number_type in ("double", "mixed") or p.mg_number_type == "double"
            for _, p in parsed
        ):
            import jax

            jax.config.update("jax_enable_x64", True)

        skipped_ref = [
            os.path.basename(c)
            for c, p in parsed
            if args.max_ref is not None and p.n_ref_global > args.max_ref
        ]
        todo = [
            (c, p)
            for c, p in parsed
            if args.max_ref is None or p.n_ref_global <= args.max_ref
        ]
        if args.skip_n:
            todo = todo[args.skip_n:]

        def run_isolated(config_path: str) -> list[dict]:
            """One config in a fresh subprocess (fresh TPU client)."""
            rows_path = config_path + ".rows.json"
            proc = subprocess.run(
                [sys.executable, os.path.join(REPO, "experiments", "run_one.py"),
                 config_path, rows_path],
                env=dict(os.environ),
            )
            if proc.returncode != 0:
                raise RuntimeError(f"subprocess exited {proc.returncode}")
            with open(rows_path) as f:
                return json.load(f)

        table = ConvergenceTable()
        done, skipped_budget, failed = [], [], []
        isolate = args.isolate
        for c, p in todo:
            if time.time() - t0 > args.budget_s and done:
                skipped_budget.append(os.path.basename(c))
                continue
            t_cfg = time.time()
            n_rows = len(table.rows)
            try:
                if isolate:
                    table.rows.extend(run_isolated(c))
                    table._current = None
                else:
                    cli.run_config(p, table)
            except Exception as exc:  # noqa: BLE001 - crash-safe sweep:
                # record the failure (e.g. HBM OOM at the largest LS config)
                # and keep the remaining configs running
                del table.rows[n_rows:]  # drop the partial row
                failed.append(
                    f"{os.path.basename(c)}: {type(exc).__name__}: {exc}"
                )
                print(
                    f"FAILED {os.path.basename(c)}: {type(exc).__name__}: {exc}",
                    file=sys.stderr,
                )
                msg = str(exc)
                if not isolate and ("UNAVAILABLE" in msg or "TPU worker" in msg):
                    # the in-process jax client is dead; run the remaining
                    # configs in fresh subprocesses instead of failing them all
                    isolate = True
                    failed.append(
                        "(TPU client lost — switching to --isolate subprocesses "
                        "for the remaining configs)"
                    )
                continue
            done.append((os.path.basename(c), time.time() - t_cfg))
            buf = io.StringIO()
            table.write_text(buf)
            with open(out_path, "w") as f:
                f.write(f"# experiment: {os.path.basename(gen)} "
                        f"{' '.join(args.gen_args)}\n")
                f.write(f"# started: {time.strftime('%Y-%m-%d %H:%M:%S')}"
                        f"  elapsed: {time.time() - t0:.0f} s\n")
                if args.skip_n:
                    f.write(f"# resumed with --skip-n {args.skip_n} "
                            f"(first configs ran in an earlier artifact)\n")
                for nm, dt in done:
                    f.write(f"# ran {nm} in {dt:.1f} s\n")
                f.write(buf.getvalue())
        with open(out_path, "a") as f:
            if skipped_ref:
                f.write(f"# SKIPPED (--max-ref {args.max_ref}): "
                        f"{', '.join(skipped_ref)}\n")
            if skipped_budget:
                f.write(f"# SKIPPED (budget {args.budget_s:.0f} s exhausted): "
                        f"{', '.join(skipped_budget)}\n")
            for msg in failed:
                f.write(f"# FAILED {msg}\n")
    print(f"results written to {out_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
