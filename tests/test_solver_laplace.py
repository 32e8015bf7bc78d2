"""End-to-end solver tests on Laplace/harmonic problems (config #1).

Statistical asserting rebuild of the reference's tier-2 scripts
(SURVEY.md §4): the analytic solution must lie within ``k * stderr`` of the
MC estimate (the reference only *prints* RMSE, ``testWoStCorrectness.py:
187-196``). Harmonic functions are exact fixed points of the WoS estimator
(up to the eps-shell bias), giving tight checks.
"""

import numpy as np
import jax.numpy as jnp

from dcrmontecarlo_tpu import Problem, WoStSolver, square_loop
from dcrmontecarlo_tpu.solver import SolverOptions


def test_harmonic_linear_dirichlet():
    # u = x + 2y is harmonic: WoS must reproduce it exactly in expectation.
    prob = Problem(
        dirichlet=square_loop(1.0),
        bc_dirichlet=lambda x, y: x + 2.0 * y,
    )
    solver = WoStSolver(prob, SolverOptions(target_slots=4096))
    pts = np.array([[0.0, 0.0], [0.5, 0.3], [-0.7, -0.2], [0.2, -0.8]])
    res = solver.solve(pts, n_walks=2000, max_steps=200, eps=1e-3, seed=0)
    exact = pts[:, 0] + 2.0 * pts[:, 1]
    err = np.abs(res.mean - exact)
    tol = 4.0 * res.stderr + 5e-3  # MC error + eps-shell bias
    assert (err < tol).all(), (res.mean, exact, res.stderr)


def test_harmonic_saddle():
    # u = x^2 - y^2 is harmonic.
    prob = Problem(
        dirichlet=square_loop(1.0),
        bc_dirichlet=lambda x, y: x * x - y * y,
    )
    solver = WoStSolver(prob, SolverOptions(target_slots=4096))
    pts = np.array([[0.0, 0.0], [0.4, 0.4], [-0.5, 0.1]])
    res = solver.solve(pts, n_walks=3000, max_steps=200, eps=1e-3, seed=1)
    exact = pts[:, 0] ** 2 - pts[:, 1] ** 2
    err = np.abs(res.mean - exact)
    tol = 4.0 * res.stderr + 5e-3
    assert (err < tol).all(), (res.mean, exact, res.stderr)


def test_constant_bc_zero_variance():
    # Constant BC: every walk returns the same value; stderr must be ~0.
    prob = Problem(
        dirichlet=square_loop(1.0),
        bc_dirichlet=lambda x, y: 3.5 + 0.0 * x,
    )
    solver = WoStSolver(prob, SolverOptions(target_slots=512))
    res = solver.solve(np.array([[0.1, 0.2]]), n_walks=64, max_steps=100, eps=1e-3)
    np.testing.assert_allclose(res.mean, [3.5], rtol=1e-6)
    np.testing.assert_allclose(res.stderr, [0.0], atol=1e-5)


def test_all_walks_complete():
    prob = Problem(dirichlet=square_loop(1.0))
    solver = WoStSolver(prob, SolverOptions(target_slots=256))
    res = solver.solve(np.array([[0.0, 0.0], [0.5, 0.5]]), n_walks=123,
                       max_steps=100, eps=1e-3)
    assert res.n_walks == 123
    # mean of zero-BC problem is exactly zero
    np.testing.assert_allclose(res.mean, 0.0, atol=1e-7)
    assert res.total_steps > 0


def test_reproducible_given_seed():
    prob = Problem(dirichlet=square_loop(1.0),
                   bc_dirichlet=lambda x, y: jnp.sin(x) * jnp.cosh(y))
    solver = WoStSolver(prob, SolverOptions(target_slots=512))
    pts = np.array([[0.2, -0.3]])
    r1 = solver.solve(pts, n_walks=500, max_steps=100, eps=1e-3, seed=7)
    r2 = solver.solve(pts, n_walks=500, max_steps=100, eps=1e-3, seed=7)
    r3 = solver.solve(pts, n_walks=500, max_steps=100, eps=1e-3, seed=8)
    assert r1.mean[0] == r2.mean[0]
    assert r1.mean[0] != r3.mean[0]


def test_harmonic_sin_sinh():
    # u = sin(x) sinh(y) is harmonic; nontrivial BC on all sides.
    prob = Problem(
        dirichlet=square_loop(1.0),
        bc_dirichlet=lambda x, y: jnp.sin(x) * jnp.sinh(y),
    )
    solver = WoStSolver(prob, SolverOptions(target_slots=8192))
    pts = np.array([[0.0, 0.5], [0.5, -0.5], [-0.3, 0.0]])
    res = solver.solve(pts, n_walks=4000, max_steps=200, eps=1e-3, seed=3)
    exact = np.sin(pts[:, 0]) * np.sinh(pts[:, 1])
    err = np.abs(res.mean - exact)
    tol = 4.0 * res.stderr + 5e-3
    assert (err < tol).all(), (res.mean, exact, res.stderr)
