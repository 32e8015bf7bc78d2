"""Poisson source tests (config #3, rebuild of ``tests/testWostWithSource.py``)
and mixed Dirichlet/Neumann WoSt (config #2).

The reference's source test solves ``lap u = -f`` with ``f = -4`` and exact
solution ``u = x^2 + y^2`` on a 4x4 square (``testWostWithSource.py:44-57``)
and only prints stats; here the same problem is asserted within MC bounds.
"""

import numpy as np
import jax.numpy as jnp

from dcrmontecarlo_tpu import Problem, WoStSolver, square_loop, circle_loop
from dcrmontecarlo_tpu.solver import SolverOptions


def test_poisson_quadratic_source():
    # u = x^2 + y^2  =>  lap u = 4, so with sign convention -lap u = f,
    # f = -4 (reference testWostWithSource.py:51-57).
    prob = Problem(
        dirichlet=square_loop(2.0),
        bc_dirichlet=lambda x, y: x * x + y * y,
        source=lambda x, y: -4.0 + 0.0 * x,
    )
    solver = WoStSolver(prob, SolverOptions(target_slots=8192))
    pts = np.array([[0.0, 0.0], [1.0, 0.5], [-1.2, -0.7], [0.3, 1.5]])
    res = solver.solve(pts, n_walks=4000, max_steps=300, eps=1e-3, seed=0)
    exact = pts[:, 0] ** 2 + pts[:, 1] ** 2
    err = np.abs(res.mean - exact)
    tol = 4.0 * res.stderr + 0.02
    assert (err < tol).all(), (res.mean, exact, res.stderr, err, tol)


def test_poisson_bubble_zero_bc():
    # -lap u = 1 on the unit disk, u=0 on boundary -> u = (1 - r^2)/4.
    prob = Problem(
        dirichlet=circle_loop(1.0, n=256),
        bc_dirichlet=lambda x, y: 0.0 * x,
        source=lambda x, y: 1.0 + 0.0 * x,
    )
    solver = WoStSolver(prob, SolverOptions(target_slots=8192))
    pts = np.array([[0.0, 0.0], [0.5, 0.0], [0.0, -0.8]])
    res = solver.solve(pts, n_walks=6000, max_steps=300, eps=1e-3, seed=1)
    r2 = pts[:, 0] ** 2 + pts[:, 1] ** 2
    exact = (1.0 - r2) / 4.0
    err = np.abs(res.mean - exact)
    tol = 4.0 * res.stderr + 5e-3
    assert (err < tol).all(), (res.mean, exact, res.stderr)


def test_mixed_neumann_strip():
    # Strip x in [-1, 1] with reflecting (zero-flux) walls at x=+-1 modeled
    # as Neumann segments, Dirichlet at y=0 (u=y is NOT constant-flux across
    # the walls, so use u = y which has zero x-flux: grad u = (0,1) -> the
    # reflecting vertical walls are consistent). Domain: tall box, Dirichlet
    # top and bottom, Neumann sides; u = y harmonic with du/dn = 0 on sides.
    from dcrmontecarlo_tpu.geometry import Polyline

    dirichlet = Polyline.concat([
        Polyline.from_points([[-1.0, 0.0], [1.0, 0.0]]),   # bottom: u=0
        Polyline.from_points([[-1.0, 2.0], [1.0, 2.0]]),   # top: u=2
    ])
    neumann = Polyline.concat([
        Polyline.from_points([[-1.0, 0.0], [-1.0, 2.0]]),
        Polyline.from_points([[1.0, 0.0], [1.0, 2.0]]),
    ])
    prob = Problem(
        dirichlet=dirichlet,
        neumann=neumann,
        bc_dirichlet=lambda x, y: y,
    )
    solver = WoStSolver(prob, SolverOptions(target_slots=8192))
    pts = np.array([[0.0, 1.0], [0.5, 0.5], [-0.8, 1.5]])
    res = solver.solve(pts, n_walks=4000, max_steps=500, eps=1e-3, seed=2)
    exact = pts[:, 1]
    err = np.abs(res.mean - exact)
    tol = 4.0 * res.stderr + 0.02
    assert (err < tol).all(), (res.mean, exact, res.stderr)


def test_neumann_circle_obstacle_runs():
    # Geometry of testWostWithSource.py:10-40: square Dirichlet + circular
    # Neumann obstacle. Smoke: finite results within BC range, and walkers
    # on the obstacle reflect rather than terminate.
    prob = Problem(
        dirichlet=square_loop(2.0),
        neumann=circle_loop(0.5, n=32),
        bc_dirichlet=lambda x, y: x * x + y * y,
    )
    solver = WoStSolver(prob, SolverOptions(target_slots=4096))
    pts = np.array([[1.0, 1.0], [0.7, 0.0], [0.0, -1.5]])
    res = solver.solve(pts, n_walks=1000, max_steps=500, eps=1e-3, seed=3)
    assert np.isfinite(res.mean).all()
    # harmonic-measure average of BC in [0, 8]
    assert (res.mean > 0.0).all() and (res.mean < 8.0).all()
