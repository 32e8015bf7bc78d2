from .state import WalkerState, init_state
from .wost import WoStSolver, SolveResult, SolverOptions

__all__ = [
    "WalkerState",
    "init_state",
    "WoStSolver",
    "SolveResult",
    "SolverOptions",
]
