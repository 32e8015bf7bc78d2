from .problem import Problem
from .fields import smooth_circle, constant, gaussian_bump, gaussian_dipole

__all__ = [
    "Problem",
    "smooth_circle",
    "constant",
    "gaussian_bump",
    "gaussian_dipole",
]
