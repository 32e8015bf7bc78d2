from .fdm import fdm_solve, FDMSolution
from .fem import fem_solve
from .pins import notebook_oracle_pins

__all__ = ["fdm_solve", "fem_solve", "FDMSolution", "notebook_oracle_pins"]
