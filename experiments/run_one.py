#!/usr/bin/env python
"""Run ONE experiment config in a fresh process and dump its table rows.

Used by run_experiment.py --isolate (and its auto-failover): a TPU worker
crash (JaxRuntimeError UNAVAILABLE) kills the jax client for the whole
process, so sweeps that must survive service crashes run each config in a
subprocess.  Output: JSON list of row dicts on the path given as argv[2].
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    config_path, rows_path = sys.argv[1], sys.argv[2]
    sys.path.insert(0, REPO)
    if os.environ.get("MGTPU_PLATFORM"):
        import jax

        jax.config.update("jax_platforms", os.environ["MGTPU_PLATFORM"])

    from dealii_multigrid_tpu.utils.params import RunParameters

    params = RunParameters.parse(config_path)
    if params.number_type in ("double", "mixed") or params.mg_number_type == "double":
        import jax

        jax.config.update("jax_enable_x64", True)

    from dealii_multigrid_tpu import cli
    from dealii_multigrid_tpu.utils.table import ConvergenceTable

    table = ConvergenceTable()
    cli.run_config(params, table)
    with open(rows_path, "w") as f:
        json.dump(table.rows, f)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
