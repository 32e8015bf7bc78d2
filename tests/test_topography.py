"""Topographic DCR survey (heightmap Neumann surface)."""

import numpy as np

from dcrmontecarlo_tpu.models import (
    drape_electrodes,
    rolling_hills,
    topographic_survey_problem,
)
from dcrmontecarlo_tpu.solver import SolverOptions, WoStSolver


def test_drape_electrodes_on_terrain():
    h = rolling_hills(amplitude=5.0, wavelength=60.0)
    xs = np.linspace(-50, 50, 11)
    e = drape_electrodes(h, xs, nudge=0.5)
    # below the surface by ~nudge
    gap = h(e[:, 0]) - e[:, 1]
    assert (gap > 0.2).all() and (gap < 1.0).all()


def test_topographic_problem_builds():
    prob, h = topographic_survey_problem(half_width=100.0, depth=150.0,
                                         resolution=4.0)
    assert prob.neumann is not None
    assert prob.neumann.num_segments > 40  # heightmap polyline
    assert prob.use_delta_tracking
    assert 0 < prob.sigma_bar < 10


def test_topographic_survey_solves():
    prob, h = topographic_survey_problem(
        half_width=100.0, depth=150.0, resolution=4.0,
        current_a=(-20.0, None), current_b=(20.0, None),
    )
    xs = np.arange(-40.0, 41.0, 10.0)
    electrodes = drape_electrodes(h, xs, nudge=0.5)
    solver = WoStSolver(prob, SolverOptions(target_slots=8192))
    res = solver.solve(electrodes, n_walks=600, max_steps=600, eps=0.5, seed=0)
    assert np.isfinite(res.mean).all()
    # + electrode side positive, - side negative (allowing MC noise on the
    # outermost electrodes)
    i_pos = int(np.argmin(np.abs(xs + 20)))
    i_neg = int(np.argmin(np.abs(xs - 20)))
    assert res.mean[i_pos] > 0, res.mean
    assert res.mean[i_neg] < 0, res.mean
    # walkers stay inside: potentials bounded (far-field BC is 0)
    assert np.abs(res.mean).max() < 1.0
