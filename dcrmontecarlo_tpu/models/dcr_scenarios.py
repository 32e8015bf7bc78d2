"""DCR survey scenarios (rebuilds of C17 and C18).

Two concrete survey "models":

* :func:`geophysical_scenario` — the 200 m survey of
  ``tests/testGeophysicalScenario.py``: background 100 S/m, conductor
  10 S/m at (-20, -30) r=10, conductor 1000 S/m at (25, -40) r=10, 1 A
  Gaussian dipole at +/-10 m, 9 surface electrodes at 10 m spacing.
* :func:`notebook_survey` — the 1000 m dipole-dipole survey of
  ``tests/testNotebook.ipynb`` (cells 3, 17-19): 21 electrodes at 40 m
  spacing from -400 to 400 m, current dipole A=(-200, 0) B=(200, 0),
  background 1e-2 S/m, conductor 1e-1 at (-120, -80) r=60, resistor 1e-3
  at (120, -80) r=60.

Deliberate deviations (documented):

* anomaly transition ``sharpness`` defaults to a physically-smoothed value
  instead of the reference's 100/m sigmoid: near-discontinuous coefficient
  fields drive ``|sigma'|`` to ~1e5, far beyond any usable delta-tracking
  majorant — the reference silently clamps the resulting weights
  (``WoStSolver.py:282``) after its own ``sigma_bar`` fallback fires
  (``WoStSolver.py:134-136``). A smooth transition keeps the estimator in
  its valid regime; the FDM oracle uses the identical smooth field.
* the notebook's extra air-conductivity sigmoid (1e-8 above y=0 with
  sharpness 1e4, cell 17) is omitted: the insulating air interface is
  modelled exactly by the Neumann top boundary, which is also what the
  walk actually enforces.
"""

from typing import Tuple

import numpy as np

from ..problems.fields import smooth_circle
from ..survey.dcr import DCRSurvey, surface_electrode_line

__all__ = ["geophysical_scenario", "notebook_survey"]


def _anomalous_conductivity(background, anomalies, sharpness):
    bumps = [
        (value - background, smooth_circle(center, radius, sharpness))
        for center, radius, value in anomalies
    ]

    def conductivity(x, y):
        total = background + 0.0 * x
        for dv, bump in bumps:
            total = total + dv * bump(x, y)
        return total

    return conductivity


def geophysical_scenario(sharpness: float = 0.5) -> Tuple[DCRSurvey, np.ndarray]:
    """200 m DCR survey (``testGeophysicalScenario.py:77-150``).

    Returns ``(survey, electrodes)``; run with the reference's solve knobs
    ``n_walks=100, max_steps=500, eps=1.0`` or stronger.
    """
    conductivity = _anomalous_conductivity(
        background=1e2,
        anomalies=[
            ((-20.0, -30.0), 10.0, 1e1),
            ((25.0, -40.0), 10.0, 1e3),
        ],
        sharpness=sharpness,
    )
    survey = DCRSurvey(
        half_width=100.0,
        depth=200.0,
        current_a=(-10.0, 0.0),
        current_b=(10.0, 0.0),
        conductivity=conductivity,
        current=1.0,
        source_width=0.5,
    )
    electrodes = surface_electrode_line((-40.0, 40.0), 10.0, y=0.0)
    return survey, electrodes


def notebook_survey(sharpness: float = 0.1) -> Tuple[DCRSurvey, np.ndarray]:
    """1000 m dipole-dipole survey (notebook cells 3, 17-19).

    Electrodes at y = -0.1 (slightly below the Neumann surface, as in
    cell 19) from -400 to 400 m at 40 m spacing.
    """
    conductivity = _anomalous_conductivity(
        background=1e-2,
        anomalies=[
            ((-120.0, -80.0), 60.0, 1e-1),
            ((120.0, -80.0), 60.0, 1e-3),
        ],
        sharpness=sharpness,
    )
    # The notebook places the current dipole at y = 0, 1 m under its
    # Neumann surface at y = 1 — well within the 5 m Gaussian width, so a
    # large fraction of the regularized current would fall outside the
    # domain. Place it pre-buried at 2 widths (the relocation
    # DCRSurvey._bury_source would apply anyway, made explicit here).
    survey = DCRSurvey(
        half_width=500.0,
        depth=1001.0,
        current_a=(-200.0, -9.0),
        current_b=(200.0, -9.0),
        conductivity=conductivity,
        current=1.0,
        source_width=5.0,
        surface_y=1.0,
        # local_majorant="auto" is worth switching on for ABSOLUTE-
        # potential estimates here (sigma' confined to ~8% of the 1000 m
        # domain; measured 2.5x better |err|^2 x time vs the FDM oracle,
        # 8-seed median). Left OFF as the pinned-oracle-test default
        # only because the dV/CRN effect measures neutral (THEORY.md
        # §4d) — users chasing absolute potentials should enable it.
    )
    electrodes = surface_electrode_line((-400.0, 400.0), 40.0, y=-0.1)
    return survey, electrodes
