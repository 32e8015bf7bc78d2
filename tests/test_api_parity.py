"""API-parity checks: the OO polyline facade and reference-style solve
options exist and behave (a reference user switching over finds the same
surface)."""

import numpy as np
import jax.numpy as jnp

from dcrmontecarlo_tpu import Problem, WoStSolver, square_loop
from dcrmontecarlo_tpu.geometry import Polyline
from dcrmontecarlo_tpu.solver import SolverOptions


def test_polyline_oo_distance():
    poly = Polyline.from_points(
        [[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0], [0.0, 0.0]]
    )
    d = poly.distance(jnp.asarray([0.5, 0.5]))
    np.testing.assert_allclose(float(d), 0.5, atol=1e-6)
    batch = poly.distance(np.array([[0.5, 0.5], [0.25, 0.5]]))
    np.testing.assert_allclose(np.asarray(batch), [0.5, 0.25], atol=1e-6)


def test_polyline_oo_silhouette():
    poly = Polyline.from_points([[0.0, 0.0], [1.0, 1.0], [2.0, 0.0]])
    m = poly.is_silhouette(np.array([1.5, 0.6]))
    assert np.asarray(m).tolist() == [True]
    d = poly.silhouette_distance(np.array([1.5, 0.6]))
    np.testing.assert_allclose(float(d), np.hypot(0.5, 0.4), rtol=1e-6)


def test_polyline_oo_intersect():
    poly = square_loop(0.5, center=(0.5, 0.5))
    hp, nv, hit = poly.intersect(np.array([0.5, 0.5]), np.array([1.0, 0.0]), 2.0)
    assert hit
    np.testing.assert_allclose(np.asarray(hp), [1.0, 0.5], atol=1e-6)
    np.testing.assert_allclose(np.asarray(nv), [-1.0, 0.0], atol=1e-6)


def test_solve_return_history():
    prob = Problem(dirichlet=square_loop(1.0),
                   bc_dirichlet=lambda x, y: x + y)
    solver = WoStSolver(prob, SolverOptions(target_slots=64))
    pts = np.array([[0.0, 0.0], [0.3, 0.3]])
    res, history = solver.solve(pts, n_walks=50, max_steps=100, eps=1e-3,
                                return_history=True, history_walks=4)
    assert set(history.keys()) == {0, 1}
    assert len(history[0]) == 4
    walk = history[0][0]
    assert walk["path"][0]["dirichlet_distance"] > 0
    assert walk["contributions"][-1]["type"] == "boundary"


def test_problem_setters():
    # reference setBoundaryConditions / setSourceTerm (WoStSolver.py:141-157)
    prob = Problem(dirichlet=square_loop(1.0))
    prob.set_boundary_conditions(lambda x, y: 1.0 + 0.0 * x)
    prob.set_source_term(lambda x, y: 0.0 * x)
    res = WoStSolver(prob, SolverOptions(target_slots=64)).solve(
        np.array([[0.0, 0.0]]), n_walks=32, max_steps=50, eps=1e-3
    )
    np.testing.assert_allclose(res.mean, [1.0], rtol=1e-5)


def test_polyline_oo_ray_intersection():
    # reference test_polyline_ray_intersection (PolylinesSimple.py:336-344):
    # unit square, ray +x from the center hits segment 1 at t = 0.5
    poly = Polyline.from_points(
        [[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0], [0.0, 0.0]]
    )
    t = np.asarray(poly.ray_intersection(np.array([0.5, 0.5]),
                                         np.array([1.0, 0.0])))
    assert t.shape == (4,)
    np.testing.assert_allclose(t[1], 0.5, atol=1e-6)
    assert np.isinf(t[[0, 2, 3]]).all()
    # non-unit direction: times scale with |direction| (reference semantics)
    t2 = np.asarray(poly.ray_intersection(np.array([0.5, 0.5]),
                                          np.array([2.0, 0.0])))
    np.testing.assert_allclose(t2[1], 0.25, atol=1e-6)


def test_setters_invalidate_compiled_solve():
    # Regression: the compiled solve fn used to be cached only on the solve
    # shape, so a second solve after set_boundary_conditions /
    # set_source_term silently reused the old physics (the reference's
    # setters DO take effect, WoStSolver.py:141-157).
    import numpy as np

    from dcrmontecarlo_tpu import Problem, WoStSolver, square_loop
    from dcrmontecarlo_tpu.solver import SolverOptions

    prob = Problem(dirichlet=square_loop(1.0),
                   bc_dirichlet=lambda x, y: 0.0 * x)
    s = WoStSolver(prob, SolverOptions(target_slots=1024))
    pts = np.array([[0.0, 0.0]])
    r0 = s.solve(pts, n_walks=500, max_steps=100, eps=1e-3, seed=0)
    np.testing.assert_allclose(r0.mean, [0.0], atol=1e-6)

    prob.set_boundary_conditions(lambda x, y: 2.0 + 0.0 * x)
    r1 = s.solve(pts, n_walks=500, max_steps=100, eps=1e-3, seed=0)
    np.testing.assert_allclose(r1.mean, [2.0], atol=1e-4)

    # source setter: u = x^2 + y^2 needs BOTH the BC and f = -4
    prob.set_boundary_conditions(lambda x, y: x * x + y * y)
    prob.set_source_term(lambda x, y: -4.0 + 0.0 * x)
    r2 = s.solve(pts, n_walks=2000, max_steps=200, eps=1e-3, seed=0)
    assert abs(float(r2.mean[0]) - 0.0) < 4 * float(r2.stderr[0]) + 0.02


def test_nonpositive_alpha_warns():
    import warnings

    import jax.numpy as jnp

    from dcrmontecarlo_tpu import Problem, square_loop

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        Problem(dirichlet=square_loop(2.0),
                alpha=lambda x, y: 0.5 + x)  # dips below 0 on the domain
    assert any("strictly" in str(x.message) for x in w), [
        str(x.message) for x in w
    ]
