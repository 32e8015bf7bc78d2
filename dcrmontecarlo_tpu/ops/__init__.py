from .bessel import i0, i0e, k0, k0e
from .greens import (
    greens_2d,
    greens_norm_2d,
    screened_chord_integral,
    screened_greens_2d,
    screened_greens_norm_2d,
    screened_interior_prob,
)

__all__ = [
    "i0",
    "i0e",
    "k0",
    "k0e",
    "greens_2d",
    "greens_norm_2d",
    "screened_chord_integral",
    "screened_greens_2d",
    "screened_greens_norm_2d",
    "screened_interior_prob",
]
