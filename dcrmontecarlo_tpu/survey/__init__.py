from .efield import EFieldResult, estimate_field
from .dcr import (
    surface_electrode_line,
    dipole_voltages,
    apparent_resistivity_2d,
    apparent_resistivity_halfspace,
    DCRSurvey,
    SurveyResult,
    Pseudosection,
    halfspace_domain,
    dipole_dipole_pairs,
    run_pseudosection,
)

__all__ = [
    "EFieldResult",
    "estimate_field",
    "surface_electrode_line",
    "dipole_voltages",
    "apparent_resistivity_2d",
    "apparent_resistivity_halfspace",
    "DCRSurvey",
    "SurveyResult",
    "Pseudosection",
    "halfspace_domain",
    "dipole_dipole_pairs",
    "run_pseudosection",
]
