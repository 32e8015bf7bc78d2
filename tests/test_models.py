"""Model-zoo scenario builders solve correctly (C14-C16 rebuilds)."""

import numpy as np

from dcrmontecarlo_tpu.models import (
    interior_grid,
    polynomial_manufactured,
    poisson_solve_points,
    poisson_square,
    trig_manufactured,
    variable_coefficient_problem,
    varcoeff_solve_points,
)
from dcrmontecarlo_tpu.solver import SolverOptions, WoStSolver


def test_polynomial_model():
    prob, u_exact = polynomial_manufactured()
    pts = interior_grid(n_points=3)
    res = WoStSolver(prob, SolverOptions(target_slots=8192)).solve(
        pts, n_walks=2000, max_steps=800, eps=1e-3, seed=0
    )
    rmse = np.sqrt(np.mean((res.mean - u_exact(pts)) ** 2))
    assert rmse < 0.08, rmse


def test_trig_model():
    prob, u_exact = trig_manufactured()
    pts = interior_grid(n_points=3)
    res = WoStSolver(prob, SolverOptions(target_slots=8192)).solve(
        pts, n_walks=2500, max_steps=800, eps=1e-3, seed=1
    )
    rmse = np.sqrt(np.mean((res.mean - u_exact(pts)) ** 2))
    assert rmse < 0.15, (rmse, res.mean, u_exact(pts))


def test_poisson_model():
    prob, u_exact = poisson_square()
    pts = poisson_solve_points(n=5)
    res = WoStSolver(prob, SolverOptions(target_slots=8192)).solve(
        pts, n_walks=1500, max_steps=300, eps=1e-3, seed=2
    )
    err = np.abs(res.mean - u_exact(pts))
    assert (err < 4 * res.stderr + 0.03).mean() > 0.9


def test_varcoeff_model_runs():
    # This model's diffusion bump drives sigma' to ~-2.7, so unbounded
    # delta-tracking weights are heavy-tailed (rare walks compound
    # (1 - sigma'/sigma_bar) > 1 factors exponentially; finite mean,
    # exploding higher moments). The accuracy gates for this model live in
    # test_solver_varcoeff; this sanity check runs with the documented
    # variance control, the attenuation cap.
    prob = variable_coefficient_problem()
    assert prob.use_delta_tracking and prob.neumann is not None
    pts = varcoeff_solve_points(n=5)
    res = WoStSolver(
        prob, SolverOptions(target_slots=4096, max_attenuation=50.0)
    ).solve(pts, n_walks=300, max_steps=500, eps=1e-3, seed=3)
    assert np.isfinite(res.mean).all()
    # solution bounded by max |BC| + source effects; loose sanity bound
    assert np.abs(res.mean).max() < 5.0


def test_varcoeff_uncapped_is_finite():
    prob = variable_coefficient_problem()
    pts = varcoeff_solve_points(n=3)
    res = WoStSolver(prob, SolverOptions(target_slots=2048)).solve(
        pts, n_walks=200, max_steps=400, eps=1e-3, seed=3
    )
    # without the cap the estimate stays finite (tails are heavy, not inf)
    assert np.isfinite(res.mean).all() and np.isfinite(res.stderr).all()


def test_autodiff_manufactured_circle_exotic_fields():
    # The autodiff MMS factory derives f = -div(alpha grad u) + sigma u
    # with jax.grad at trace time for ANY smooth fields (the reference
    # hand-derives its two manufactured sources and has a sign slip in
    # one); gate an exotic coefficient set on a circular domain at 4
    # sigma.
    import jax.numpy as jnp

    from dcrmontecarlo_tpu.geometry import circle_loop
    from dcrmontecarlo_tpu.models import autodiff_manufactured
    from dcrmontecarlo_tpu.solver import SolverOptions, WoStSolver

    u = lambda x, y: jnp.exp(0.3 * x) * jnp.cos(0.8 * y)
    alpha = lambda x, y: 1.5 + 0.4 * jnp.sin(x) * jnp.cos(y)
    sigma = lambda x, y: 0.5 + 0.2 * x * x
    prob, u_exact = autodiff_manufactured(u, alpha, sigma,
                                          dirichlet=circle_loop(1.2, n=128))
    s = WoStSolver(prob, SolverOptions(target_slots=16384))
    pts = np.array([[0.0, 0.0], [0.5, 0.3], [-0.4, 0.6]], np.float32)
    r = s.solve(pts, n_walks=6000, max_steps=800, eps=1e-3, seed=0)
    dev = np.abs(r.mean - u_exact(pts)) / np.maximum(r.stderr, 1e-12)
    assert (dev < 4.0).all(), (r.mean, u_exact(pts), dev)


def test_autodiff_manufactured_neumann_curved_wall_field():
    # Zero-flux wall with u = cos(0.7x) cosh(0.7y) (du/dy = 0 at y=0) and
    # alpha = exp(0.4 y): the wall field CURVES along the wall, so this
    # exercises exactly the regime where the chain Robin realization must
    # stay unbiased (and the frozen-u~ reflectance would not); auto
    # resolves to "chain" here (scale ~ 0.8).
    import jax.numpy as jnp

    from dcrmontecarlo_tpu.geometry import Polyline
    from dcrmontecarlo_tpu.models import autodiff_manufactured
    from dcrmontecarlo_tpu.solver import SolverOptions, WoStSolver

    u = lambda x, y: jnp.cos(0.7 * x) * jnp.cosh(0.7 * y)
    alpha = lambda x, y: jnp.exp(0.4 * y) + 0.0 * x
    prob, u_exact = autodiff_manufactured(
        u, alpha,
        dirichlet=Polyline.from_points(
            [[-2.0, 0.0], [-2.0, -3.0], [2.0, -3.0], [2.0, 0.0]]),
        neumann=Polyline.from_points([[-2.0, 0.0], [2.0, 0.0]]))
    s = WoStSolver(prob, SolverOptions(target_slots=32768))
    assert s._robin_enabled() == "chain"
    pts = np.array([[0.0, -0.1], [1.0, -0.5], [-1.2, -0.2]], np.float32)
    r = s.solve(pts, n_walks=12000, max_steps=2000, eps=0.01, seed=1)
    dev = np.abs(r.mean - u_exact(pts)) / np.maximum(r.stderr, 1e-12)
    assert (dev < 4.0).all(), (r.mean, u_exact(pts), dev)


def test_local_majorant_unbiased_on_manufactured():
    # Local-majorant solves must agree with the analytic solution (and
    # with the global-majorant solve): autodiff MMS problem with a sharp
    # coefficient bump whose sigma' load is confined to a box.
    import dataclasses

    import jax.numpy as jnp

    from dcrmontecarlo_tpu.models import autodiff_manufactured
    from dcrmontecarlo_tpu.solver import SolverOptions, WoStSolver

    u = lambda x, y: x + 0.5 * y + 0.2 * x * y
    alpha = lambda x, y: 1.0 + 3.0 * jnp.exp(
        -(((x - 0.4) ** 2 + (y - 0.4) ** 2) / 0.02))
    prob_g, u_exact = autodiff_manufactured(u, alpha)
    prob_l, _ = autodiff_manufactured(u, alpha, local_majorant="auto")
    lm = prob_l.local_majorant
    assert lm is not None and lm.sigma_bar_bg < 0.5 * prob_l.sigma_bar, lm
    pts = np.array([[-0.5, -0.5], [0.0, 0.0], [0.5, 0.5]], np.float32)
    exact = u_exact(pts)
    for prob in (prob_g, prob_l):
        s = WoStSolver(prob, SolverOptions(target_slots=16384))
        r = s.solve(pts, n_walks=6000, max_steps=600, eps=1e-3, seed=4)
        dev = np.abs(r.mean - exact) / np.maximum(r.stderr, 1e-12)
        assert (dev < 4.0).all(), (r.mean, exact, dev)


def test_local_majorant_keeps_layers_separate():
    # Two thin full-width layers must become two separate bands (merging
    # them into one would cover the gap and silently disable the
    # far-field speedup on layered-earth geometry), and the gap between
    # them must report a positive distance.
    import numpy as np

    from dcrmontecarlo_tpu.problems.majorant import derive_local_majorant

    xs = np.linspace(-1.0, 1.0, 50)
    ys = np.linspace(-1.0, 1.0, 50)
    X, Y = np.meshgrid(xs, ys, indexing="ij")
    v = 1.0 * (np.abs(Y - 0.8) < 0.05) + 1.0 * (np.abs(Y + 0.8) < 0.05)
    lm = derive_local_majorant(v, xs, ys, global_sigma_bar=1.0)
    assert lm is not None
    assert len(lm.bands) == 2, lm
    d_mid = float(lm.distance(0.0, 0.0))
    assert d_mid > 0.5, (d_mid, lm)


def test_sigma_bar_bounds_weights_for_all_negative_sigma_prime():
    # Regression: sb = mx - mn violated the documented |weight| <= 2
    # bound when sigma' is negative EVERYWHERE (gaussian dome alpha:
    # sigma' in [-2, -1] gave sb = 1 and weights up to 3, compounding).
    # The corrected majorant max(mx, 0) - mn restores the bound, and the
    # solve stays unbiased vs the exact harmonic continuation.
    import jax.numpy as jnp

    from dcrmontecarlo_tpu import Problem, circle_loop

    prob = Problem(
        dirichlet=circle_loop(1.0, n=64),
        bc_dirichlet=lambda x, y: 1.0 + 0.0 * x,
        alpha=lambda x, y: jnp.exp(-(x * x + y * y)),
    )
    # sigma' = r^2 - 2 on the disk: all-negative
    sp0 = float(prob.sigma_prime(jnp.float32(0.0), jnp.float32(0.0)))
    assert sp0 < 0
    assert prob.sigma_bar >= 1.9, prob.sigma_bar  # ~|mn| = 2, not mx-mn = 1
    s = WoStSolver(prob, SolverOptions(target_slots=4096))
    r = s.solve(np.array([[0.0, 0.0], [0.5, 0.0]], np.float32),
                n_walks=3000, max_steps=400, eps=1e-2, seed=2)
    # exact solution: constant BC with no source/absorption -> u = 1
    dev = np.abs(r.mean - 1.0) / np.maximum(r.stderr, 1e-12)
    assert (dev < 4.0).all(), (r.mean, r.stderr)
