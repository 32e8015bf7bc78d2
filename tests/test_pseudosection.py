"""Multi-source shared-path solves + dipole-dipole pseudosection.

The walk ensemble is source-independent, so all source dipoles of a survey
line are estimated from one set of paths; correctness is checked by
(a) multi-source vs per-source single solves, and (b) a homogeneous
half-plane pseudosection recovering the true resistivity.
"""

import numpy as np

from dcrmontecarlo_tpu import Problem, WoStSolver, square_loop
from dcrmontecarlo_tpu.models import geophysical_scenario
from dcrmontecarlo_tpu.solver import SolverOptions
from dcrmontecarlo_tpu.survey import (
    DCRSurvey,
    dipole_dipole_pairs,
    run_pseudosection,
    surface_electrode_line,
)


def test_dipole_dipole_pairs():
    sources, receivers = dipole_dipole_pairs(6, num_rx_per_src=10)
    assert sources == [(0, 1), (1, 2), (2, 3)]
    assert receivers[0] == [(2, 3), (3, 4), (4, 5)]
    assert receivers[2] == [(4, 5)]


def test_multi_source_matches_single_solves():
    # Poisson with two different sources on a square: the multi-source
    # solve must agree with two independent single-source solves.
    f1 = lambda x, y: -4.0 + 0.0 * x
    f2 = lambda x, y: 6.0 * x
    bc = lambda x, y: x * x + y * y
    pts = np.array([[0.0, 0.0], [1.0, 0.5]])

    multi = Problem(dirichlet=square_loop(2.0), bc_dirichlet=bc, source=[f1, f2])
    rm = WoStSolver(multi, SolverOptions(target_slots=8192)).solve(
        pts, n_walks=4000, max_steps=300, eps=1e-3, seed=0
    )
    assert rm.mean.shape == (2, 2)

    for i, f in enumerate([f1, f2]):
        single = Problem(dirichlet=square_loop(2.0), bc_dirichlet=bc, source=f)
        rs = WoStSolver(single, SolverOptions(target_slots=8192)).solve(
            pts, n_walks=4000, max_steps=300, eps=1e-3, seed=1
        )
        err = np.abs(rm.mean[i] - rs.mean)
        tol = 4 * np.sqrt(rm.stderr[i] ** 2 + rs.stderr**2) + 1e-3
        assert (err < tol).all(), (i, rm.mean[i], rs.mean)


def test_multi_source_exact_for_u_x2y2():
    # source f1 = -4 has exact solution u = x^2 + y^2 with matching BC
    f1 = lambda x, y: -4.0 + 0.0 * x
    f2 = lambda x, y: 0.0 * x
    prob = Problem(
        dirichlet=square_loop(2.0),
        bc_dirichlet=lambda x, y: x * x + y * y,
        source=[f1, f2],
    )
    pts = np.array([[0.0, 0.0], [1.0, 1.0]])
    res = WoStSolver(prob, SolverOptions(target_slots=8192)).solve(
        pts, n_walks=4000, max_steps=300, eps=1e-3, seed=2
    )
    exact1 = pts[:, 0] ** 2 + pts[:, 1] ** 2
    err = np.abs(res.mean[0] - exact1)
    assert (err < 4 * res.stderr[0] + 0.02).all()
    # f2 = 0: harmonic continuation of the BC; at the center u > 0
    assert np.isfinite(res.mean[1]).all()


def test_pseudosection_matches_fdm_oracle():
    # Full dipole-dipole pseudosection on the 200 m scenario conductivity
    # field, cross-checked measurement-by-measurement against the FDM
    # oracle run with the identical (buried, regularized) sources.
    #
    # Note the conductivity must vary enough for delta tracking to engage
    # (sigma_bar ~ 0.07 here): screening doubles as variance control for
    # the near-point current sources — in the sigma_bar -> 0 limit the
    # single-sample source estimator's weights grow like r^2/4 * f_peak
    # and the potentials drown in heavy-tailed noise (a limitation shared
    # with, and worse in, the reference estimator).
    import jax

    from dcrmontecarlo_tpu.validation import fdm_solve

    survey, electrodes = geophysical_scenario(sharpness=0.5)
    # production pipeline options (roulette 0.05 etc): exercising the
    # shipped config — a bare SolverOptions here is a no-knobs
    # heavy-tail config that (correctly) trips the supercritical guard
    from dcrmontecarlo_tpu.survey.dcr import survey_default_options

    ps = run_pseudosection(
        survey, electrodes, num_rx_per_src=3,
        n_walks=2500, max_steps=800, eps=0.5, seed=0,
        options=survey_default_options(target_slots=32768),
    )
    assert ps.potentials.shape == (6, 9)
    assert (ps.pseudo_z < 0).all()
    assert (np.abs(ps.pseudo_x) <= 40.0).all()

    # FDM oracle for each source dipole
    from dcrmontecarlo_tpu.problems.fields import gaussian_dipole
    from dcrmontecarlo_tpu.survey.dcr import dipole_dipole_pairs

    prob = survey.build_problem()
    alpha_v = jax.vmap(lambda x, y: prob.alpha(x, y))

    def alpha_np(X, Y):
        return np.asarray(alpha_v(X.ravel(), Y.ravel())).reshape(X.shape)

    sources, receivers = dipole_dipole_pairs(9, 3)
    depth = max(survey.electrode_nudge, 2.0 * survey.source_width)
    src_pos = electrodes.copy()
    src_pos[:, 1] = -depth
    pts = electrodes.copy()
    pts[:, 1] = -survey.electrode_nudge

    n_checked = 0
    n_ok = 0
    for s, (a, b) in enumerate(sources):
        f = gaussian_dipole(src_pos[a], src_pos[b], survey.current,
                            survey.source_width)
        fv = jax.vmap(lambda x, y: f(x, y))

        def source_np(X, Y):
            import jax.numpy as jnp
            return np.asarray(
                fv(jnp.asarray(X.ravel()), jnp.asarray(Y.ravel()))
            ).reshape(X.shape)

        fdm = fdm_solve(
            bounds=((-100.0, 100.0), (-200.0, 0.0)),
            alpha=alpha_np, source=source_np, neumann_top=True,
            nx=241, ny=241,
        )
        ref = fdm(pts)
        sel = ps.src_index == s
        dv_ref = ref[ps.m_index[sel]] - ref[ps.n_index[sel]]
        dv_mc = ps.voltage[sel]
        dv_err = ps.voltage_stderr[sel]
        ok = np.abs(dv_mc - dv_ref) < 4.0 * dv_err + 3e-4
        n_checked += len(dv_mc)
        n_ok += ok.sum()
    assert n_checked == sum(len(r) for r in receivers)
    assert n_ok / n_checked >= 0.85, (n_ok, n_checked)


def test_mis_nee_unbiased_and_lower_variance():
    # Narrow Gaussian source: the plain Green's-sampled NEE has
    # heavy-tailed weights; source-directed MIS must agree within MC
    # bounds and cut stderr by a large factor.
    import jax.numpy as jnp

    from dcrmontecarlo_tpu.problems.fields import GaussianMixture

    w = 0.05
    amp = 1.0 / (2 * np.pi * w * w)
    src = lambda x, y: amp * jnp.exp(-(x * x + y * y) / (2 * w * w))
    imp = GaussianMixture.from_components([((0.0, 0.0), w, 1.0)])
    pts = np.array([[0.5, 0.0], [1.0, 1.0]])
    results = {}
    for label, sim in [("plain", None), ("mis", imp)]:
        prob = Problem(dirichlet=square_loop(2.0),
                       bc_dirichlet=lambda x, y: 0.0 * x,
                       source=src, source_importance=sim)
        s = WoStSolver(prob, SolverOptions(target_slots=8192, backend="xla"))
        results[label] = s.solve(pts, n_walks=6000, max_steps=300,
                                 eps=1e-3, seed=0)
    a, b = results["plain"], results["mis"]
    dev = np.abs(a.mean - b.mean) / np.sqrt(a.stderr**2 + b.stderr**2)
    assert (dev < 4).all(), (a.mean, b.mean)
    # at least 3x stderr reduction (typically ~8-10x)
    assert (b.stderr < a.stderr / 3).all(), (a.stderr, b.stderr)


def test_homogeneous_pseudosection_with_mis_crn():
    # The quantitative half-plane gate: homogeneous rho = 0.1 ohm-m must be
    # recovered by the dipole-dipole sweep. Requires both variance tools:
    # source-directed MIS (bounded NEE weights) and common random numbers
    # (correlated paths cancel noise in the voltage differences).
    rho = 0.1
    survey = DCRSurvey(
        half_width=300.0, depth=600.0,
        current_a=(0.0, 0.0), current_b=(1.0, 0.0),
        conductivity=lambda x, y: 10.0 + 0.0 * x,
        source_width=0.25, source_mis=True,
    )
    electrodes = surface_electrode_line((-20.0, 20.0), 5.0)
    ps = run_pseudosection(
        survey, electrodes, num_rx_per_src=4,
        n_walks=6000, max_steps=1500, eps=0.25, seed=0,
        options=SolverOptions(target_slots=32768,
                              common_random_numbers=True),
    )
    rho_a = ps.apparent_resistivity
    med = float(np.median(rho_a))
    assert abs(med - rho) / rho < 0.2, (med, rho_a)
    assert np.mean(np.abs(rho_a - rho) / rho < 0.3) >= 0.4, rho_a


def test_crn_keeps_per_point_estimates_unbiased():
    prob = Problem(dirichlet=square_loop(1.0),
                   bc_dirichlet=lambda x, y: x + 2.0 * y)
    pts = np.array([[0.0, 0.0], [0.3, 0.2], [0.31, 0.2]])
    s = WoStSolver(prob, SolverOptions(target_slots=4096,
                                       common_random_numbers=True))
    res = s.solve(pts, n_walks=4000, max_steps=200, eps=1e-3, seed=0)
    exact = pts[:, 0] + 2 * pts[:, 1]
    assert (np.abs(res.mean - exact) < 4 * res.stderr + 5e-3).all()
    # CRN: nearby points' estimates move together -> their difference is
    # tighter than the independent-walk quadrature error
    d_est = res.mean[2] - res.mean[1]
    d_exact = exact[2] - exact[1]
    quad = np.sqrt(res.stderr[1] ** 2 + res.stderr[2] ** 2)
    assert abs(d_est - d_exact) < max(0.7 * quad, 1e-3), (
        d_est, d_exact, quad
    )


def test_pseudosection_on_scenario_runs():
    survey, electrodes = geophysical_scenario()
    ps = run_pseudosection(
        survey, electrodes, num_rx_per_src=3,
        n_walks=300, max_steps=400, eps=0.9, seed=1,
        options=SolverOptions(target_slots=4096),
    )
    assert ps.potentials.shape == (6, 9)
    assert len(ps.voltage) == sum(
        len(r) for r in dipole_dipole_pairs(9, 3)[1]
    )
    assert np.isfinite(ps.voltage).all()


def test_pseudosection_single_source_line():
    # Regression: a 4-electrode line yields exactly ONE source dipole, so
    # solve() squeezes mean/stderr to (n_elec,) — the measurement loop
    # indexed u[s, m] and crashed with IndexError.
    from dcrmontecarlo_tpu.models import geophysical_scenario
    from dcrmontecarlo_tpu.survey import run_pseudosection

    survey, _ = geophysical_scenario()
    electrodes = np.stack([np.linspace(-15.0, 15.0, 4),
                           np.zeros(4)], axis=1)
    ps = run_pseudosection(survey, electrodes, num_rx_per_src=2,
                           n_walks=50, max_steps=200, eps=0.9, seed=0,
                           options=SolverOptions(target_slots=1024))
    assert len(ps.voltage) == 1 and np.isfinite(ps.voltage).all()
