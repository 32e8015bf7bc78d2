from .efield import EFieldResult, estimate_field
from .sensitivity import SensitivityResult, sensitivity_map
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
    "SensitivityResult",
    "sensitivity_map",
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
