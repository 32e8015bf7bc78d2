from .manufactured import (
    autodiff_manufactured,
    interior_grid,
    polynomial_manufactured,
    trig_manufactured,
)
from .poisson import poisson_square, poisson_solve_points
from .varcoeff import variable_coefficient_problem, varcoeff_solve_points
from .dcr_scenarios import geophysical_scenario, notebook_survey
from .topography import (
    topographic_survey_problem,
    drape_electrodes,
    rolling_hills,
)

__all__ = [
    "topographic_survey_problem",
    "drape_electrodes",
    "rolling_hills",
    "polynomial_manufactured",
    "trig_manufactured",
    "autodiff_manufactured",
    "interior_grid",
    "poisson_square",
    "poisson_solve_points",
    "variable_coefficient_problem",
    "varcoeff_solve_points",
    "geophysical_scenario",
    "notebook_survey",
]
