"""Boussinesq convection demo: bounded solves, max principle, onset.

Drives mantle_convection/demo.py (the in-repo upgrade of the reference's
mantle-convection README pointer) for a few steps on the hypercube.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "mantle_convection"))

import demo as conv_demo  # noqa: E402


def test_convection_demo_three_steps():
    _, T, hist = conv_demo.run_demo(r=2, n_steps=3)
    assert all(row["converged"] for row in hist)
    # preconditioned MINRES iteration count is mesh- and step-bounded
    assert all(row["iterations"] <= 120 for row in hist)
    # semi-Lagrangian transport + Dirichlet floor/lid: max principle
    assert all(-1e-10 <= row["T_min"] and row["T_max"] <= 1 + 1e-10 for row in hist)
    # buoyancy drives flow: convection strengthens from the perturbed start
    assert hist[-1]["umax"] > 0
    assert hist[-1]["wT"] > hist[0]["wT"] > 0
