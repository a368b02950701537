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

KEY = ("type", "geometry", "degree", "n_ref_global", "n_ref_local")


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
    for p in parts:
        comments, rows = parse(p)
        provenance.append(f"# merged from: {p} ({len(rows)} rows)")
        for r in rows:
            merged[tuple(r.get(k, "") for k in KEY)] = r

    def order(r: dict):
        num = lambda s: float(s) if s.replace(".", "", 1).isdigit() else 0
        return (
            num(r.get("n_ref_global", "0")),
            num(r.get("n_ref_local", "0")),
            num(r.get("degree", "0")),
            r.get("type", ""),
        )

    rows = sorted(merged.values(), key=order)
    header = list(rows[0].keys())
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
