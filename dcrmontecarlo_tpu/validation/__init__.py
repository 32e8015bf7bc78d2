from .fdm import fdm_solve, FDMSolution
from .fem import fem_solve

__all__ = ["fdm_solve", "fem_solve", "FDMSolution"]
