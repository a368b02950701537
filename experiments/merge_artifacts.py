#!/usr/bin/env python
"""Merge sweep artifacts (partial/resumed/targeted captures) into one table.

run_experiment.py writes crash-safe per-run artifacts; budget-cut sweeps
resume via --skip-n into part files (scripts/tpu_session_round5.sh), and
targeted recaptures land marquee configs out of order.  This helper
consolidates them: rows are parsed back from the text tables, deduplicated
by the config identity columns (LAST file wins, so list newest last), and
re-emitted in the reference's sweep order (n_ref, degree, solver).

Usage:
  python experiments/merge_artifacts.py out.txt part1.txt part2.txt ...
"""

from __future__ import annotations

import sys

# Dedup identity = the FULL row minus measurement columns.  Parameter-study
# families (tolerance/weights/hp-amg/...) legitimately contain many rows per
# (type, geometry, degree, n_ref) identity — keying on those five columns
# alone silently collapsed 9 hp-amg rows to 3 (round-4 advisor finding).
MEASUREMENT_COLS = frozenset({
    "time", "time_cg", "time_per_it", "throughput", "n_iterations",
    "converged", "setup_time", "solve_time", "l2_error", "eff",
    "workload_eff", "workload_path_max", "vertical_eff", "horizontal_eff",
    "mem_total", "time_setup", "time_solve", "mdofs",
})


def _row_key(r: dict) -> tuple:
    return tuple(sorted(
        (k, v) for k, v in r.items() if k not in MEASUREMENT_COLS
    ))


def parse(path: str) -> tuple[list[str], list[dict]]:
    """Returns (comment lines, row dicts-of-strings)."""
    comments, rows, header = [], [], None
    with open(path) as f:
        for line in f:
            line = line.rstrip("\n")
            if not line.strip():
                continue
            if line.startswith("#"):
                comments.append(line)
                continue
            cols = line.split()
            if header is None:
                header = cols
                continue
            if len(cols) != len(header):
                raise ValueError(f"{path}: ragged row: {line!r}")
            rows.append(dict(zip(header, cols)))
    return comments, rows


def main() -> int:
    out_path, parts = sys.argv[1], sys.argv[2:]
    if not parts:
        raise SystemExit("usage: merge_artifacts.py out.txt part1.txt ...")
    merged: dict[tuple, dict] = {}
    provenance = []
    header: list[str] = []
    for p in parts:
        comments, rows = parse(p)
        provenance.append(f"# merged from: {p} ({len(rows)} rows)")
        seen_here: set[tuple] = set()
        for r in rows:
            for col in r:
                if col not in header:
                    header.append(col)
            key = _row_key(r)
            if key in seen_here:
                print(f"warning: {p}: duplicate config row (same identity "
                      f"columns) — later row wins: {key}", file=sys.stderr)
            seen_here.add(key)
            merged[key] = r

    def num(s: str) -> float:
        try:
            return float(s)
        except ValueError:
            return 0.0

    def order(r: dict):
        return (
            num(r.get("n_ref_global", "0")),
            num(r.get("n_ref_local", "0")),
            num(r.get("degree", "0")),
            r.get("type", ""),
            _row_key(r),
        )

    rows = sorted(merged.values(), key=order)
    if not rows:
        raise SystemExit(
            "merge_artifacts: no data rows parsed from any input (all parts "
            "comment-only?) — nothing to write"
        )
    widths = [
        max(len(h), *(len(r.get(h, "")) for r in rows)) for h in header
    ]
    with open(out_path, "w") as f:
        for line in provenance:
            f.write(line + "\n")
        f.write(
            " ".join(h.ljust(w) for h, w in zip(header, widths)).rstrip()
            + "\n"
        )
        for r in rows:
            f.write(
                " ".join(
                    r.get(h, "").ljust(w) for h, w in zip(header, widths)
                ).rstrip()
                + "\n"
            )
    print(f"{out_path}: {len(rows)} rows from {len(parts)} artifacts")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
