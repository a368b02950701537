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


def test_convection_demo_temperature_dependent_viscosity():
    """eta(T) = eta0 * exp(-gamma T) (Frank-Kamenetskii): the viscous
    hierarchy is rebuilt from T each step; solves stay bounded and the
    rebuilt operator actually carries the viscosity contrast."""
    import numpy as np

    eta_of_T = lambda T: 10.0 * np.exp(-3.0 * T)  # ~20x top-to-bottom
    demo, T, hist = conv_demo.run_demo(r=2, n_steps=2, eta_of_T=eta_of_T)
    assert all(row["converged"] for row in hist)
    assert all(-1e-10 <= row["T_min"] and row["T_max"] <= 1 + 1e-10
               for row in hist)
    # the step-rebuilt fine operator saw the contrast: per-cell scale spans
    # roughly the eta range (h^(dim-2) factor is uniform on the hypercube)
    scale = np.asarray(demo.op.a_op.scalar.scale)
    assert scale.max() / scale.min() > 5.0
