"""Variable-coefficient mixed-boundary model (rebuild of C16,
``tests/testWostVariableCoefficients.py``).

Gaussian-bump diffusion + sinusoidal absorption on a square with an inner
circular Neumann obstacle; the reference validates qualitatively against a
hand-made approximation (``:108-133``) and is also the repo's only timing
harness (``:230-237``).
"""

import jax.numpy as jnp
import numpy as np

from ..geometry.polyline import circle_loop, square_loop
from ..problems.problem import Problem

__all__ = ["variable_coefficient_problem", "varcoeff_solve_points"]


def variable_coefficient_problem() -> Problem:
    """Reference fields (``testWostVariableCoefficients.py:37-84``):

    * diffusion ``D = 0.5 + 1.5 exp(-2 r^2)``,
    * absorption ``sigma = 0.3 + 0.7 (1 + sin(2 pi x) cos(2 pi y))``,
    * BC ``u = sin(pi x) sin(pi y)``,
    * source ``exp(-r^2) sin(pi x) cos(pi y)``.
    """

    def alpha(x, y):
        r2 = x * x + y * y
        return 0.5 + 1.5 * jnp.exp(-2.0 * r2)

    def sigma(x, y):
        return 0.3 + 0.7 * (1.0 + jnp.sin(2 * jnp.pi * x) * jnp.cos(2 * jnp.pi * y))

    def bc(x, y):
        return jnp.sin(jnp.pi * x) * jnp.sin(jnp.pi * y)

    def source(x, y):
        r2 = x * x + y * y
        return jnp.exp(-r2) * jnp.sin(jnp.pi * x) * jnp.cos(jnp.pi * y)

    return Problem(
        dirichlet=square_loop(1.5),
        neumann=circle_loop(0.4, n=32),
        bc_dirichlet=bc,
        source=source,
        alpha=alpha,
        sigma=sigma,
    )


def varcoeff_solve_points(n: int = 27, margin_radius: float = 0.5):
    """Evaluation grid excluding the obstacle
    (``testWostVariableCoefficients.py:87-104``)."""
    g = np.linspace(-1.3, 1.3, n)
    X, Y = np.meshgrid(g, g, indexing="ij")
    pts = np.stack([X.ravel(), Y.ravel()], axis=1)
    keep = np.sqrt((pts**2).sum(axis=1)) > margin_radius
    return pts[keep].astype(np.float32)
