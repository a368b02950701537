"""Shared helpers for the benchmark sweep generators.

Capability mirror of the reference's scripts/*.py config generators
(reference: scripts/small-scaling.py etc.): each sweep reads default.json,
overrides a few keys, and writes input_%04d.json files for the CLI driver.
"""

import json
import os


def load_default():
    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "default.json")) as f:
        return json.load(f)


def write_config(counter, overrides):
    cfg = load_default()
    cfg.update(overrides)
    with open("./input_%04d.json" % counter, "w") as f:
        json.dump(cfg, f, indent=4, separators=(",", ": "))
