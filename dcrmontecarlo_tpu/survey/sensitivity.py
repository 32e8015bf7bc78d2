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

__all__ = ["SensitivityResult", "sensitivity_map",
           "JacobianResult", "survey_jacobian", "linearized_update"]


class SensitivityResult(NamedTuple):
    grid: np.ndarray              # (N, 2) evaluation points
    sensitivity: np.ndarray       # (N,) dV/d alpha(x), per unit area
    sensitivity_log: np.ndarray   # (N,) dV/d ln alpha(x) = alpha * S
    stderr: np.ndarray            # (N,) error scale. With n_batches > 1
                                  # (the default): EMPIRICAL stderr from
                                  # independent batch replicas of the
                                  # product — an honest error bar that
                                  # captures the CRN-correlated factor
                                  # errors. With n_batches = 1:
                                  # first-order propagation of the two
                                  # E-field quadrature bounds, which
                                  # drops the E_s/E_a error covariance —
                                  # treat only as a weighting scale.
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
    n_batches: int = 4,
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
        eps=eps, seed=seed, options=options, n_batches=n_batches,
    )
    ex_s, ey_s = f.ex[0], f.ey[0]
    ex_a, ey_a = f.ex[1], f.ey[1]
    sens = -(ex_s * ex_a + ey_s * ey_a)
    if f.ex_batches is not None:
        # HONEST error bar: spread of per-batch products over independent
        # replicas captures the CRN-correlated factor errors that
        # first-order propagation drops (point estimate stays the
        # product of the full-ensemble means — less product bias than a
        # mean of batch products)
        s_b = -(f.ex_batches[:, 0] * f.ex_batches[:, 1]
                + f.ey_batches[:, 0] * f.ey_batches[:, 1])
        stderr = s_b.std(axis=0, ddof=1) / np.sqrt(len(s_b))
    else:
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


class JacobianResult(NamedTuple):
    grid: np.ndarray          # (N, 2) evaluation points
    rows: np.ndarray          # (M, N) dV_m/d alpha(x) per unit area
    rows_log: np.ndarray      # (M, N) dV_m/d ln alpha(x) = alpha * rows
    stderr: np.ndarray        # (M, N) error scales (same semantics as
                              # SensitivityResult.stderr: empirical with
                              # n_batches > 1, propagated otherwise)
    src_pairs: list           # (M,) (a, b) electrode-index tuples
    rx_pairs: list            # (M,) (m, n) electrode-index tuples
    fields: tuple             # (ex, ey), each (n_dipoles, N): the shared
                              # unit-dipole field set the rows are built of


def survey_jacobian(
    survey,
    electrodes,
    grid_points,
    num_rx_per_src: int = 10,
    h: float = None,
    n_walks: int = 4000,
    max_steps: int = 500,
    eps: float = 0.9,
    seed: int = 0,
    options: SolverOptions = None,
    n_batches: int = 4,
) -> JacobianResult:
    """Fréchet Jacobian of EVERY dipole-dipole voltage in one solve.

    The key identity: every measurement row is the pairwise product
    ``-I * E_s(x) . E_r(x)`` of fields from the SAME set of unit
    consecutive-electrode dipoles — source dipole ``(i, i+1)`` and
    receiver dipole ``(j, j+1)`` are the same kind of object by
    reciprocity. So the ``n_electrodes - 1`` unit dipoles ride one walker
    ensemble as simultaneous sources (walk paths are source-independent),
    ONE CRN stencil solve estimates all their E-fields at the grid, and
    the full Jacobian (M measurements x N cells) assembles as outer
    products — versus ``M`` adjoint PDE solves for a FEM Jacobian.

    Measurement enumeration matches :func:`dipole_dipole_pairs`
    (SimPEG dipole-dipole convention, as in ``run_pseudosection``).
    Rows are ordered source-major: for each source pair, its receivers
    in increasing offset.
    """
    from .dcr import dipole_dipole_pairs

    elec = np.asarray(electrodes, np.float64).reshape(-1, 2)
    n_elec = len(elec)
    if h is None:
        h = 0.5 * survey.source_width
    w = survey.source_width
    buried = [survey._bury_source(p) for p in elec]
    n_dip = n_elec - 1
    sources = [
        gaussian_dipole(buried[k], buried[k + 1], 1.0, w)
        for k in range(n_dip)
    ]
    # reuse the survey's own problem (one sigma' grid scan, and survey
    # features like local_majorant carry over); the setters bump the
    # problem version so compiled-solve caches stay coherent
    problem = survey.build_problem()
    problem.set_source_term(sources)
    if survey.source_mis:
        problem.set_source_importance(GaussianMixture.from_components(
            [(p, w, 1.0 / n_elec) for p in buried]
        ))

    f = estimate_field(
        problem, grid_points, h=h, n_walks=n_walks, max_steps=max_steps,
        eps=eps, seed=seed, options=options, n_batches=n_batches,
    )
    ex, ey = f.ex, f.ey                      # (n_dip, N)
    exe, eye = f.ex_stderr, f.ey_stderr
    src_list, rx_lists = dipole_dipole_pairs(n_elec, num_rx_per_src)
    cur = survey.current
    rows, errs, src_pairs, rx_pairs = [], [], [], []
    for (a, b), rxs in zip(src_list, rx_lists):
        s = a  # consecutive dipole (a, a+1) is unit dipole index a
        for (m, n) in rxs:
            r = m
            rows.append(-cur * (ex[s] * ex[r] + ey[s] * ey[r]))
            if f.ex_batches is not None:
                # empirical: spread of per-batch products (see
                # sensitivity_map)
                r_b = -cur * (f.ex_batches[:, s] * f.ex_batches[:, r]
                              + f.ey_batches[:, s] * f.ey_batches[:, r])
                errs.append(r_b.std(axis=0, ddof=1) / np.sqrt(len(r_b)))
            else:
                errs.append(cur * np.sqrt(
                    (ex[r] * exe[s]) ** 2 + (ex[s] * exe[r]) ** 2
                    + (ey[r] * eye[s]) ** 2 + (ey[s] * eye[r]) ** 2
                ))
            src_pairs.append((a, b))
            rx_pairs.append((m, n))
    rows = np.stack(rows)
    errs = np.stack(errs)
    pts = np.asarray(grid_points, np.float64).reshape(-1, 2)
    import jax.numpy as jnp

    alpha_g = np.asarray(problem.alpha(jnp.asarray(pts[:, 0]),
                                       jnp.asarray(pts[:, 1])))
    return JacobianResult(
        grid=pts,
        rows=rows,
        rows_log=rows * alpha_g[None, :],
        stderr=errs,
        src_pairs=src_pairs,
        rx_pairs=rx_pairs,
        fields=(ex, ey),
    )


def linearized_update(jac: JacobianResult, d_resid, cell_area,
                      lam_rel: float = 0.05, log_space: bool = False):
    """One Tikhonov-regularized linearized (Born / Gauss-Newton) update.

    Solves ``min ||A m - d||^2 + lam ||m||^2`` with ``A = rows * cell_area``
    (so ``m`` is the per-cell conductivity perturbation ``d_alpha``, or
    ``d ln alpha`` with ``log_space=True``) via the dual normal equations —
    the measurement count is tiny next to the cell count, so
    ``A^T (A A^T + lam I)^{-1} d`` is the cheap direction. ``lam`` is set
    relative to the data-space operator scale ``trace(A A^T)/M``, which
    makes ``lam_rel`` dimensionless and transferable across surveys.
    """
    d = np.asarray(d_resid, np.float64)
    A = np.asarray(jac.rows_log if log_space else jac.rows,
                   np.float64) * cell_area
    gram = A @ A.T
    lam = lam_rel * np.trace(gram) / max(len(d), 1)
    return A.T @ np.linalg.solve(gram + lam * np.eye(len(d)), d)
