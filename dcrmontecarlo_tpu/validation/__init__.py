from .fdm import fdm_solve, FDMSolution

__all__ = ["fdm_solve", "FDMSolution"]
