from .radial import (
    sample_greens_radius,
    greens_radial_pdf,
    sample_screened_radius_exact,
    sample_screened_radius_transport,
    screened_radial_pdf,
)
from .mis import RadialDistribution, uniform_radial, mis_sample

__all__ = [
    "sample_greens_radius",
    "greens_radial_pdf",
    "sample_screened_radius_exact",
    "sample_screened_radius_transport",
    "screened_radial_pdf",
    "RadialDistribution",
    "uniform_radial",
    "mis_sample",
]
