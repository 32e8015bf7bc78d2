"""PDE problem definition (TPU-native rebuild of the solver-construction
half of reference ``WostSolver_2D.__init__`` + ``buildModifiedSigma``,
``solvers/WoStSolver.py:22-138``).

A :class:`Problem` bundles:

* the Dirichlet boundary polyline (required) and optional Neumann polyline,
* the Dirichlet BC field ``g(x, y)``,
* the optional source field ``f(x, y)``,
* optional variable coefficients ``alpha(x, y)`` (diffusion) and
  ``sigma(x, y)`` (absorption) for the PDE
  ``-div(alpha grad u) + sigma u = f``.

If either coefficient is given, the delta-tracking transform of
Sawhney et al. 2023 is applied (reference ``WoStSolver.py:88-127``):

    ``sigma'(x) = sigma/alpha + (lap(alpha)/alpha - |grad ln alpha|^2 / 2) / 2``

Unlike the reference — which evaluates this with *runtime* nested torch
autograd per walker step — ``sigma_prime`` here is built once with
``jax.grad`` at trace time and fuses into the compiled step. The screening
majorant ``sigma_bar`` is the max-min spread of ``sigma'`` on a coefficient
grid scan (reference ``WoStSolver.py:130-136`` semantics, including the
10.0 fallback for degenerate spreads, which is kept for parity and
documented).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Optional

import jax.numpy as jnp

from ..geometry.polyline import Polyline
from ..utils.autodiff import gradient, laplacian
from ..utils.gridscan import grid_min_max

__all__ = ["Problem"]

_ALPHA_EPS = 1e-8  # reference clamps alpha >= 1e-8 (WoStSolver.py:84-86)


def _zero_field(x, y):
    return 0.0 * x


@dataclass
class Problem:
    """Static problem description. Not a pytree: the solver closes over it
    at trace time (geometry arrays become compile-time constants, fields
    trace inline)."""

    dirichlet: Polyline
    neumann: Optional[Polyline] = None
    bc_dirichlet: Callable = field(default=None)  # g(x, y)
    source: Optional[Callable] = None             # f(x, y)
    alpha: Optional[Callable] = None              # diffusion coefficient
    sigma: Optional[Callable] = None              # absorption coefficient
    sigma_bar_resolution: int = 50                # grid scan res (WoStSolver.py:130)
    sigma_bar_override: Optional[float] = None    # skip the grid scan

    # derived (filled in __post_init__)
    use_delta_tracking: bool = field(init=False, default=False)
    alpha_c: Optional[Callable] = field(init=False, default=None)
    sigma_prime: Optional[Callable] = field(init=False, default=None)
    sigma_bar: Optional[float] = field(init=False, default=None)
    domain_bounds: tuple = field(init=False, default=None)

    def __post_init__(self):
        if self.bc_dirichlet is None:
            # default zero Dirichlet BC (WoStSolver.py:45-48)
            self.bc_dirichlet = _zero_field

        # domain bounds over both boundaries (WoStSolver.py:38-43)
        (dx0, dx1), (dy0, dy1) = self.dirichlet.bounds()
        if self.neumann is not None:
            (nx0, nx1), (ny0, ny1) = self.neumann.bounds()
            bounds = (
                (min(dx0, nx0), max(dx1, nx1)),
                (min(dy0, ny0), max(dy1, ny1)),
            )
        else:
            bounds = ((dx0, dx1), (dy0, dy1))
        self.domain_bounds = bounds

        if self.alpha is not None or self.sigma is not None:
            # missing coefficient defaults (WoStSolver.py:55-58)
            alpha = self.alpha if self.alpha is not None else (lambda x, y: 1.0 + 0.0 * x)
            sigma = self.sigma if self.sigma is not None else _zero_field
            self.alpha = alpha
            self.sigma = sigma
            self.use_delta_tracking = True

            def alpha_c(x, y):
                return jnp.maximum(alpha(x, y), _ALPHA_EPS)

            self.alpha_c = alpha_c

            def log_alpha(x, y):
                return jnp.log(alpha_c(x, y) + _ALPHA_EPS)

            lap_alpha = laplacian(alpha_c)
            grad_log_alpha = gradient(log_alpha)

            def sigma_prime(x, y):
                a = alpha_c(x, y)
                gx, gy = grad_log_alpha(x, y)
                grad_norm2 = gx * gx + gy * gy
                return sigma(x, y) / a + 0.5 * (lap_alpha(x, y) / a - grad_norm2 / 2.0)

            self.sigma_prime = sigma_prime

            if self.sigma_bar_override is not None:
                self.sigma_bar = float(self.sigma_bar_override)
            else:
                # sigma_bar = max - min of sigma' on a grid scan
                # (WoStSolver.py:129-136). The max-min spread (rather than
                # the max) is kept for reference parity; with the clamp
                # max(1 - sigma'/sigma_bar, 0) in the walk it remains a
                # valid, if conservative, majorant whenever min <= 0.
                mn, mx, _, _ = grid_min_max(
                    sigma_prime, bounds, self.sigma_bar_resolution
                )
                sb = mx - mn
                if sb <= 0 or sb > 1e3:
                    # reference fallback (WoStSolver.py:134-136)
                    if sb > 1e3:
                        import warnings

                        warnings.warn(
                            f"sigma' spread {sb:.3g} exceeds 1e3; falling "
                            "back to sigma_bar=10.0 for reference parity. "
                            "Delta-tracking weights will be clamped/biased "
                            "where |sigma'| >> sigma_bar — smooth the "
                            "coefficient field or set sigma_bar_override."
                        )
                    sb = 10.0
                self.sigma_bar = float(sb)

    @property
    def diameter(self) -> float:
        (x0, x1), (y0, y1) = self.domain_bounds
        return float(jnp.sqrt((x1 - x0) ** 2 + (y1 - y0) ** 2))

    def set_boundary_conditions(self, bc: Callable) -> None:
        """Reference ``setBoundaryConditions`` (``WoStSolver.py:141-148``)."""
        self.bc_dirichlet = bc

    def set_source_term(self, source: Callable) -> None:
        """Reference ``setSourceTerm`` (``WoStSolver.py:150-157``)."""
        self.source = source
