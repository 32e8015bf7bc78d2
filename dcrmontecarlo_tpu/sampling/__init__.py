from .radial import (
    sample_greens_radius,
    greens_radial_pdf,
    ScreenedRadialTable,
    build_screened_radial_table,
    sample_screened_radius,
    sample_screened_radius_exact,
    screened_radial_pdf,
)
from .mis import RadialDistribution, uniform_radial, mis_sample

__all__ = [
    "sample_greens_radius",
    "greens_radial_pdf",
    "ScreenedRadialTable",
    "build_screened_radial_table",
    "sample_screened_radius",
    "sample_screened_radius_exact",
    "screened_radial_pdf",
    "RadialDistribution",
    "uniform_radial",
    "mis_sample",
]
