from .fdm import fdm_solve, FDMSolution
from .fem import fem_solve
from .pins import cylinder_oracle_pins, notebook_oracle_pins

__all__ = ["fdm_solve", "fem_solve", "FDMSolution", "notebook_oracle_pins",
           "cylinder_oracle_pins"]
