"""Poisson-with-source model (rebuild of C15, ``tests/testWostWithSource.py``).

Exact solution ``u = x^2 + y^2`` with ``f = -4`` on a 4x4 Dirichlet square;
the optional circular Neumann obstacle of the reference setup (built at
``testWostWithSource.py:10-40`` but then not passed to the solver at
``:101``) is available via ``with_obstacle=True``.
"""

from typing import Callable, Tuple

import numpy as np

from ..geometry.polyline import circle_loop, square_loop
from ..problems.problem import Problem

__all__ = ["poisson_square", "poisson_solve_points"]


def poisson_square(with_obstacle: bool = False) -> Tuple[Problem, Callable]:
    def u_exact(pts):
        return pts[:, 0] ** 2 + pts[:, 1] ** 2

    prob = Problem(
        dirichlet=square_loop(2.0),
        neumann=circle_loop(0.5, n=32) if with_obstacle else None,
        bc_dirichlet=lambda x, y: x * x + y * y,
        source=lambda x, y: -4.0 + 0.0 * x,
    )
    return prob, u_exact


def poisson_solve_points(n: int = 21, margin_radius: float = 0.6):
    """Evaluation grid skipping the obstacle (``testWostWithSource.py:60-76``)."""
    g = np.linspace(-1.8, 1.8, n)
    X, Y = np.meshgrid(g, g, indexing="ij")
    pts = np.stack([X.ravel(), Y.ravel()], axis=1)
    keep = np.sqrt((pts**2).sum(axis=1)) > margin_radius
    return pts[keep].astype(np.float32)
