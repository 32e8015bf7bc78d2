"""Reciprocity sensitivity maps (``survey/sensitivity.py``).

An ACTUAL perturbation test against the finite-volume oracle: the
predicted first-order voltage change ``sum S * d_alpha * dA`` under a
conductivity bump must match ``V(alpha + d_alpha) - V(alpha)`` from two
FDM solves. This validates the adjoint identity end-to-end: signs, the
unit adjoint dipole, the consistent Gaussian regularization of the
receiver functional, and both E-field estimates.

(Beyond the reference, which has no sensitivity/Jacobian capability.)
"""

import numpy as np
import jax.numpy as jnp

from dcrmontecarlo_tpu.problems.fields import gaussian_bump, gaussian_dipole
from dcrmontecarlo_tpu.solver import SolverOptions
from dcrmontecarlo_tpu.survey import DCRSurvey, sensitivity_map
from dcrmontecarlo_tpu.validation.fdm import fdm_solve


def test_sensitivity_matches_fdm_perturbation():
    w = 2.0
    alpha0 = lambda x, y: 1.0 + 0.0 * x
    bump = gaussian_bump(center=(0.0, -18.0), amplitude=1.0, width=9.0)
    epsb = 0.3
    alpha1 = lambda x, y: 1.0 + epsb * bump(x, y)

    survey = DCRSurvey(half_width=100.0, depth=100.0,
                       current_a=(-30.0, -4.0), current_b=(30.0, -4.0),
                       conductivity=alpha0, source_width=w, source_mis=True)
    rx_m, rx_n = (5.0, -4.0), (15.0, -4.0)

    # -- oracle: two FDM solves, V = <q_MN, u> (same Gaussian receiver
    #    functional the sensitivity map differentiates) ----------------- #
    prob = survey.build_problem()
    src_np = lambda X, Y: np.asarray(
        prob.source_fields[0](jnp.asarray(X), jnp.asarray(Y)))
    q_adj = gaussian_dipole(rx_m, rx_n, 1.0, w)
    bounds = ((-100.0, 100.0), (-100.0, 0.0))

    def solve_v(alpha_fn):
        a_np = lambda X, Y: np.asarray(
            alpha_fn(jnp.asarray(X), jnp.asarray(Y)))
        sol = fdm_solve(bounds=bounds, alpha=a_np, source=src_np,
                        neumann_top=True, nx=257, ny=257)
        xs, ys, u = sol.xs, sol.ys, sol.u
        X, Y = np.meshgrid(xs, ys, indexing="ij")
        q = np.asarray(q_adj(jnp.asarray(X.ravel()),
                             jnp.asarray(Y.ravel()))).reshape(X.shape)
        return np.sum(q * u) * (xs[1] - xs[0]) * (ys[1] - ys[0])

    dv_fdm = solve_v(alpha1) - solve_v(alpha0)
    assert dv_fdm < 0  # conductive bump under the array lowers |V|... sign
    # pinned by the oracle itself; the MC map must reproduce it

    # -- MC sensitivity map, integrated against the same d_alpha ------- #
    gx = np.linspace(-22.0, 22.0, 10)
    gy = np.linspace(-40.0, -2.0, 9)
    GX, GY = np.meshgrid(gx, gy, indexing="ij")
    grid = np.stack([GX.ravel(), GY.ravel()], 1)
    d_area = (gx[1] - gx[0]) * (gy[1] - gy[0])
    res = sensitivity_map(survey, rx_m, rx_n, grid, h=3.0, n_walks=3500,
                          max_steps=800, eps=0.5, seed=7,
                          options=SolverOptions(target_slots=1 << 16))
    assert np.isfinite(res.sensitivity).all()
    d_alpha = epsb * np.asarray(
        bump(jnp.asarray(grid[:, 0]), jnp.asarray(grid[:, 1])))
    dv_pred = np.sum(res.sensitivity * d_alpha) * d_area
    # measured rel err 0.066 at this config (0.003 at 6000 walks on the
    # finer 12x11 grid); empirical seed spread at 3500 walks ~0.15 —
    # gate at 30%
    assert abs(dv_pred - dv_fdm) < 0.30 * abs(dv_fdm), (dv_pred, dv_fdm)
    # log-conductivity rows are alpha-scaled (alpha0 = 1 here)
    np.testing.assert_allclose(res.sensitivity_log, res.sensitivity,
                               rtol=1e-6)


def test_survey_jacobian_row_matches_sensitivity_map():
    # The whole-survey Jacobian builds every row from ONE shared unit-
    # dipole field set; each row must agree (within combined conservative
    # bounds) with the independently-estimated single-measurement map,
    # and the enumeration must follow the dipole-dipole convention.
    from dcrmontecarlo_tpu.survey import (
        sensitivity_map,
        surface_electrode_line,
        survey_jacobian,
    )

    alpha0 = lambda x, y: 1.0 + 0.0 * x
    elec = surface_electrode_line((-20.0, 20.0), 10.0)  # 5 electrodes
    survey = DCRSurvey(half_width=80.0, depth=80.0,
                       current_a=tuple(elec[0]), current_b=tuple(elec[1]),
                       conductivity=alpha0, source_width=2.0,
                       source_mis=True)
    grid = np.array([[0.0, -8.0], [5.0, -15.0], [-8.0, -10.0]], np.float32)
    jac = survey_jacobian(survey, elec, grid, num_rx_per_src=2, h=3.0,
                          n_walks=2500, max_steps=400, eps=0.5, seed=3,
                          options=SolverOptions(target_slots=1 << 15))
    assert np.isfinite(jac.rows).all()
    assert jac.src_pairs[0] == (0, 1) and jac.rx_pairs[0] == (2, 3)
    assert jac.rows.shape == (len(jac.src_pairs), len(grid))

    single = sensitivity_map(survey, tuple(elec[2]), tuple(elec[3]), grid,
                             h=3.0, n_walks=2500, max_steps=400, eps=0.5,
                             seed=4,
                             options=SolverOptions(target_slots=1 << 15))
    comb = np.sqrt(jac.stderr[0] ** 2 + single.stderr ** 2)
    dev = np.abs(jac.rows[0] - single.sensitivity) / np.maximum(comb, 1e-12)
    assert (dev < 4.0).all(), (jac.rows[0], single.sensitivity, dev)


def test_born_inversion_localizes_anomaly():
    # End-to-end imaging: FDM synthetic dipole-dipole data over a planted
    # conductive bump, the MC survey Jacobian, one Tikhonov-regularized
    # Born update (examples/inversion_demo.py is the full-size version).
    # Gates: the image peak lands within one grid cell of the anomaly in
    # x and two cells in depth, and correlates with the truth.
    from dcrmontecarlo_tpu.survey import (
        dipole_dipole_pairs,
        linearized_update,
        surface_electrode_line,
        survey_jacobian,
    )

    true_center = (6.0, -10.0)
    alpha0 = lambda x, y: 1.0 + 0.0 * x
    bump = gaussian_bump(center=true_center, amplitude=1.0, width=5.0)
    alpha1 = lambda x, y: 1.0 + bump(x, y)
    elec = surface_electrode_line((-20.0, 20.0), 5.0)
    w = 1.5
    survey = DCRSurvey(half_width=60.0, depth=60.0,
                       current_a=tuple(elec[0]), current_b=tuple(elec[1]),
                       conductivity=alpha0, source_width=w,
                       source_mis=True)
    buried = [survey._bury_source(p) for p in elec]
    src_list, rx_lists = dipole_dipole_pairs(len(elec), 4)

    def fdm_data(alpha_fn):
        a_np = lambda X, Y: np.asarray(
            alpha_fn(jnp.asarray(X), jnp.asarray(Y)))
        out = []
        for (a, b), rxs in zip(src_list, rx_lists):
            src = gaussian_dipole(buried[a], buried[b], 1.0, w)
            s_np = lambda X, Y: np.asarray(
                src(jnp.asarray(X), jnp.asarray(Y)))
            sol = fdm_solve(bounds=((-60.0, 60.0), (-60.0, 0.0)),
                            alpha=a_np, source=s_np, neumann_top=True,
                            nx=201, ny=201)
            xs, ys, u = sol.xs, sol.ys, sol.u
            X, Y = np.meshgrid(xs, ys, indexing="ij")
            d_area = (xs[1] - xs[0]) * (ys[1] - ys[0])
            for (m, n) in rxs:
                q = gaussian_dipole(buried[m], buried[n], 1.0, w)
                qv = np.asarray(
                    q(jnp.asarray(X.ravel()),
                      jnp.asarray(Y.ravel()))).reshape(X.shape)
                out.append(np.sum(qv * u) * d_area)
        return np.array(out)

    d_resid = fdm_data(alpha1) - fdm_data(alpha0)

    gx = np.linspace(-22.0, 22.0, 12)
    gy = np.linspace(-20.0, -3.0, 7)
    GX, GY = np.meshgrid(gx, gy, indexing="ij")
    grid = np.stack([GX.ravel(), GY.ravel()], 1)
    cell = (gx[1] - gx[0]) * (gy[1] - gy[0])
    # n_batches pinned to 1: the peak/corr gates below were calibrated on
    # this exact realization (batch seeds are hashed, so the default
    # n_batches=4 is a different draw; estimate quality is equivalent and
    # the batch machinery has its own test)
    jac = survey_jacobian(survey, elec, grid, num_rx_per_src=4, h=1.5,
                          n_walks=5000, max_steps=500, eps=0.3, seed=5,
                          options=SolverOptions(target_slots=1 << 16),
                          n_batches=1)
    m = linearized_update(jac, d_resid, cell, lam_rel=0.05)
    M = m.reshape(len(gx), len(gy))
    truth = np.asarray(bump(jnp.asarray(grid[:, 0]),
                            jnp.asarray(grid[:, 1])))
    pk = np.unravel_index(np.argmax(M), M.shape)
    # measured: peak (6.0, -8.67), corr 0.61 at this config/seed
    assert abs(gx[pk[0]] - true_center[0]) <= 4.1, (gx[pk[0]], gy[pk[1]])
    assert abs(gy[pk[1]] - true_center[1]) <= 5.7, (gx[pk[0]], gy[pk[1]])
    corr = np.corrcoef(m, truth)[0, 1]
    assert corr > 0.4, corr


def test_batch_error_bars_consistent():
    # n_batches > 1 switches sensitivity/jacobian stderr to the empirical
    # spread of independent batch replicas (honest under CRN-correlated
    # factor errors). The batch-mode estimate must agree with the
    # single-ensemble one within combined errors, and the bars must be
    # finite and positive.
    from dcrmontecarlo_tpu.survey import (
        sensitivity_map,
        surface_electrode_line,
    )

    alpha0 = lambda x, y: 1.0 + 0.0 * x
    elec = surface_electrode_line((-20.0, 20.0), 10.0)
    survey = DCRSurvey(half_width=80.0, depth=80.0,
                       current_a=tuple(elec[0]), current_b=tuple(elec[1]),
                       conductivity=alpha0, source_width=2.0,
                       source_mis=True)
    grid = np.array([[0.0, -8.0], [5.0, -15.0]], np.float32)
    one = sensitivity_map(survey, tuple(elec[2]), tuple(elec[3]), grid,
                          h=3.0, n_walks=2400, max_steps=400, eps=0.5,
                          seed=4,
                          options=SolverOptions(target_slots=1 << 15))
    bat = sensitivity_map(survey, tuple(elec[2]), tuple(elec[3]), grid,
                          h=3.0, n_walks=2400, max_steps=400, eps=0.5,
                          seed=4, n_batches=6,
                          options=SolverOptions(target_slots=1 << 15))
    assert np.isfinite(bat.stderr).all() and (bat.stderr > 0).all()
    comb = np.sqrt(one.stderr ** 2 + bat.stderr ** 2)
    dev = np.abs(one.sensitivity - bat.sensitivity) / np.maximum(comb, 1e-12)
    assert (dev < 4.0).all(), (one.sensitivity, bat.sensitivity, dev)

    # the jacobian's empirical branch too (per-batch row products)
    from dcrmontecarlo_tpu.survey import survey_jacobian

    jac = survey_jacobian(survey, elec, grid, num_rx_per_src=2, h=3.0,
                          n_walks=2400, max_steps=400, eps=0.5, seed=4,
                          n_batches=6,
                          options=SolverOptions(target_slots=1 << 15))
    assert np.isfinite(jac.rows).all()
    assert np.isfinite(jac.stderr).all() and (jac.stderr > 0).all()
    assert jac.stderr.shape == jac.rows.shape
