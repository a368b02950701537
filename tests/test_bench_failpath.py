"""bench.py failure-path properties (round-4 verdict #1: two rounds of
BENCH_r{3,4}.json shipped no parseable TPU number because the failure
path either rc=1'd or slept past the driver timeout).

The contract: whatever happens after startup, stdout already carries at
least one parseable JSON line with the metric schema, and every stale
fallback parses too.  These tests exercise the emit helpers directly
(no backend, no subprocess) — the on-chip path is validated by the
round-5 session's step-0 bench run.
"""

import importlib.util
import json
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture()
def bench(tmp_path, monkeypatch):
    spec = importlib.util.spec_from_file_location(
        "bench_under_test", os.path.join(REPO, "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    # point the last-good seed paths into the sandbox
    monkeypatch.setattr(mod, "_LAST_GOOD", str(tmp_path / "lg.json"))
    monkeypatch.setattr(mod, "_LAST_GOOD_SEED", str(tmp_path / "seed.json"))
    return mod


def _parse_lines(capsys):
    out = capsys.readouterr().out.strip().splitlines()
    assert out, "nothing printed"
    return [json.loads(line) for line in out]


def test_emit_stale_without_any_seed_still_parses(bench, capsys):
    rc = bench._emit_stale("backend down")
    assert rc == 0
    (row,) = _parse_lines(capsys)
    assert row["metric"] == "mg_cg_throughput_quadrant_p4_1chip"
    assert row["stale"] is True and "unit" in row and "value" in row


def test_emit_stale_prefers_seed_and_marks_it(bench, capsys):
    seed = {"metric": "mg_cg_throughput_quadrant_p4_1chip",
            "value": 1.25e8, "unit": "DoF/s", "vs_baseline": 1.0}
    with open(bench._LAST_GOOD_SEED, "w") as f:
        json.dump(seed, f)
    rc = bench._emit_stale("watchdog fired")
    assert rc == 0
    (row,) = _parse_lines(capsys)
    assert row["value"] == seed["value"]
    assert row["stale"] is True and "watchdog" in row["stale_reason"]


def test_provisional_line_prints_first_and_parses(bench, capsys):
    bench._emit_provisional()
    rows = _parse_lines(capsys)
    assert rows and rows[0]["stale"] is True
    # last-line-wins: a later fresh emit supersedes it
    bench._emit({"metric": "m", "value": 2.0, "unit": "DoF/s",
                 "vs_baseline": 1.0})
    rows = _parse_lines(capsys)
    assert rows[-1]["value"] == 2.0


def test_ab_overrides_block_seed_update(bench, monkeypatch, capsys):
    monkeypatch.setenv("MGTPU_GC_CHAIN", "0")  # an A/B knob
    bench._save_last_good({"metric": "m", "value": 1.0, "unit": "u",
                           "vs_baseline": 1.0})
    assert not os.path.exists(bench._LAST_GOOD_SEED)
    monkeypatch.delenv("MGTPU_GC_CHAIN")
    monkeypatch.setenv("MGTPU_THP", "1")  # benign knob: seed updates
    bench._save_last_good({"metric": "m", "value": 1.0, "unit": "u",
                           "vs_baseline": 1.0})
    assert os.path.exists(bench._LAST_GOOD_SEED)
    with open(bench._LAST_GOOD_SEED) as f:
        assert "captured_at" in json.load(f)
