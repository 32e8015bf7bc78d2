"""Measurement sensitivity (Fréchet derivative) maps via reciprocity.

The reference stops at forward modelling; the quantity a DCR practitioner
needs next is the sensitivity of each measured voltage to the conductivity
model — the Jacobian kernel every deterministic inversion is built on.

For the measurement ``V = u_s(M) - u_n(N)`` of the potential ``u_s`` driven
by the current dipole ``A/B`` through ``-div(alpha grad u_s) = q_AB``, the
first-order response to a conductivity perturbation ``d_alpha(x)`` is the
classic adjoint/reciprocity identity

    ``dV = - int d_alpha(x) grad u_s(x) . grad u_a(x) dx``

where ``u_a`` solves the SAME operator with a UNIT current dipole at the
receiver pair ``M/N`` (integrate ``div(alpha grad du_s) =
-div(d_alpha grad u_s)`` against ``u_a`` and apply the divergence theorem
twice; the boundary terms vanish on grounded far-field Dirichlet walls and
zero-flux Neumann surfaces). In field form (``E = -grad u``):

    ``S(x) = dV / d_alpha(x) = - E_s(x) . E_a(x)``   (per unit area)

Both fields come from ONE walker ensemble: walk paths are independent of
the source term (``solver/state.py``), so the problem simply carries the
``A/B`` and ``M/N`` dipoles as two simultaneous source fields, and the CRN
central-difference estimator (``survey/efield.py``) differentiates both at
once. The regularization is consistent: the ``M/N`` "electrodes" are the
same Gaussian blobs the survey uses for injection, so ``V`` is the
Gaussian-smoothed potential difference — exactly the functional whose
derivative the map is.

Validated against the finite-volume oracle by an actual perturbation test
(``tests/test_sensitivity.py``): ``sum S * d_alpha * dA`` matches the FDM
voltage change under a conductivity bump.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

from ..problems.fields import GaussianMixture, gaussian_dipole
from ..solver.wost import SolverOptions
from .efield import estimate_field

__all__ = ["SensitivityResult", "sensitivity_map"]


class SensitivityResult(NamedTuple):
    grid: np.ndarray              # (N, 2) evaluation points
    sensitivity: np.ndarray       # (N,) dV/d alpha(x), per unit area
    sensitivity_log: np.ndarray   # (N,) dV/d ln alpha(x) = alpha * S
    stderr: np.ndarray            # (N,) conservative (quadrature) bound
    e_source: tuple               # (ex, ey) of the A/B current field
    e_adjoint: tuple              # (ex, ey) of the unit M/N field


def sensitivity_map(
    survey,
    rx_m,
    rx_n,
    grid_points,
    h: float = None,
    n_walks: int = 4000,
    max_steps: int = 500,
    eps: float = 0.9,
    seed: int = 0,
    options: SolverOptions = None,
) -> SensitivityResult:
    """Sensitivity of the ``(rx_m, rx_n)`` voltage to ``alpha(x)``.

    Args:
        survey: a :class:`~dcrmontecarlo_tpu.survey.DCRSurvey` (its
            ``current_a/current_b`` drive the source field; its
            ``conductivity``/geometry define the operator).
        rx_m, rx_n: receiver electrode positions; buried below the
            insulating surface exactly like current electrodes (the unit
            adjoint dipole is a current injection by reciprocity).
        grid_points: (N, 2) points where the kernel is evaluated.
        h: central-difference step for both E-fields; default = half the
            survey's source width (the finest scale in the fields).

    Returns a :class:`SensitivityResult`; integrate
    ``sensitivity * d_alpha`` over the model region (quadrature weights of
    the caller's grid) to predict a voltage change, or feed
    ``sensitivity_log`` rows into a log-conductivity inversion.
    """
    if h is None:
        h = 0.5 * survey.source_width
    problem = survey.build_problem()
    m = survey._bury_source(rx_m)
    n = survey._bury_source(rx_n)
    adj = gaussian_dipole(m, n, 1.0, survey.source_width)
    problem.set_source_term(problem.source_fields + [adj])
    if survey.source_mis:
        # importance must cover every simultaneous source: walks that feed
        # the adjoint accumulator need NEE mass at the receiver blobs too
        a = survey._bury_source(survey.current_a)
        b = survey._bury_source(survey.current_b)
        w = survey.source_width
        problem.set_source_importance(GaussianMixture.from_components(
            [(a, w, 0.25), (b, w, 0.25), (m, w, 0.25), (n, w, 0.25)]
        ))

    f = estimate_field(
        problem, grid_points, h=h, n_walks=n_walks, max_steps=max_steps,
        eps=eps, seed=seed, options=options,
    )
    ex_s, ey_s = f.ex[0], f.ey[0]
    ex_a, ey_a = f.ex[1], f.ey[1]
    sens = -(ex_s * ex_a + ey_s * ey_a)
    stderr = np.sqrt(
        (ex_a * f.ex_stderr[0]) ** 2 + (ex_s * f.ex_stderr[1]) ** 2
        + (ey_a * f.ey_stderr[0]) ** 2 + (ey_s * f.ey_stderr[1]) ** 2
    )
    pts = np.asarray(grid_points, np.float64).reshape(-1, 2)
    import jax.numpy as jnp

    alpha_g = np.asarray(problem.alpha(jnp.asarray(pts[:, 0]),
                                       jnp.asarray(pts[:, 1])))
    return SensitivityResult(
        grid=pts,
        sensitivity=sens,
        sensitivity_log=alpha_g * sens,
        stderr=stderr,
        e_source=(ex_s, ey_s),
        e_adjoint=(ex_a, ey_a),
    )
