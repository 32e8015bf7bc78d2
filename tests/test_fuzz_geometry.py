"""Randomized-geometry solver gates.

Harmonic polynomials are EXACT solutions of the Laplace problem on any
domain, so random polygons can be oracle-gated at 4 sigma with zero
reference cost — a fuzz harness for the geometry kernels (closest-point /
silhouette / first-hit are the most intricate code in the solver, and the
reference's own unit tests only ever used axis-aligned squares and one
wedge). Seeds are fixed: failures reproduce.
"""

import numpy as np

from dcrmontecarlo_tpu import Problem, WoStSolver
from dcrmontecarlo_tpu.geometry import Polyline
from dcrmontecarlo_tpu.solver import SolverOptions


def _random_convex_polygon(rng, n_verts, radius=1.0):
    """Convex polygon: sorted random angles, jittered radii."""
    ang = np.sort(rng.uniform(0, 2 * np.pi, n_verts))
    rad = radius * rng.uniform(0.6, 1.0, n_verts)
    pts = np.stack([rad * np.cos(ang), rad * np.sin(ang)], 1)
    closed = np.concatenate([pts, pts[:1]])  # from_points is OPEN
    return Polyline.from_points(closed.tolist())


_HARMONICS = [
    lambda x, y: x + 2.0 * y,
    lambda x, y: x * x - y * y,
    lambda x, y: x * y,
    lambda x, y: x**3 - 3.0 * x * y * y,
]


def test_fuzz_random_convex_polygons_harmonic():
    rng = np.random.default_rng(7)
    for trial in range(6):
        n_verts = int(rng.integers(5, 12))
        poly = _random_convex_polygon(rng, n_verts)
        u = _HARMONICS[trial % len(_HARMONICS)]
        prob = Problem(dirichlet=poly, bc_dirichlet=u)
        # interior points: shrink the vertex hull toward its centroid
        verts = np.asarray(poly.seg_a)[np.asarray(poly.seg_valid)]
        c = verts.mean(0)
        pts = (c + 0.5 * (verts[:3] - c)).astype(np.float32)
        s = WoStSolver(prob, SolverOptions(target_slots=4096))
        r = s.solve(pts, n_walks=2000, max_steps=400, eps=1e-3,
                    seed=100 + trial)
        exact = u(pts[:, 0], pts[:, 1])
        err = np.abs(r.mean - exact)
        tol = 4.0 * r.stderr + 2e-3  # + eps-shell bias slack
        assert (err < tol).all(), (trial, n_verts, r.mean, exact, r.stderr)


def test_fuzz_random_star_polygons_harmonic():
    # NON-convex star polygons: concave vertices exercise the silhouette
    # logic's sign conventions even without a Neumann boundary (walkers
    # must never cross the boundary; a first-hit/winding slip shows up as
    # a biased interior value).
    rng = np.random.default_rng(11)
    for trial in range(4):
        n_arm = int(rng.integers(5, 9))
        ang = np.linspace(0, 2 * np.pi, 2 * n_arm, endpoint=False)
        ang = ang + rng.uniform(-0.1, 0.1, ang.shape)
        rad = np.where(np.arange(2 * n_arm) % 2 == 0, 1.0,
                       rng.uniform(0.45, 0.65))
        pts = np.stack([rad * np.cos(ang), rad * np.sin(ang)], 1)
        pts = np.concatenate([pts, pts[:1]])  # from_points is OPEN
        poly = Polyline.from_points(pts.tolist())
        u = _HARMONICS[trial % len(_HARMONICS)]
        prob = Problem(dirichlet=poly, bc_dirichlet=u)
        eval_pts = np.array([[0.0, 0.0], [0.15, -0.1]], np.float32)
        s = WoStSolver(prob, SolverOptions(target_slots=4096))
        r = s.solve(eval_pts, n_walks=2500, max_steps=600, eps=1e-3,
                    seed=200 + trial)
        exact = u(eval_pts[:, 0], eval_pts[:, 1])
        err = np.abs(r.mean - exact)
        tol = 4.0 * r.stderr + 2e-3
        assert (err < tol).all(), (trial, r.mean, exact, r.stderr)


def test_fuzz_random_smooth_coefficients_mms():
    # Random smooth coefficient fields through the autodiff MMS factory:
    # arbitrary alpha/sigma combinations become exact-oracle problems.
    import jax.numpy as jnp

    from dcrmontecarlo_tpu.geometry import square_loop
    from dcrmontecarlo_tpu.models import autodiff_manufactured

    rng = np.random.default_rng(3)
    for trial in range(3):
        a1, a2 = rng.uniform(0.2, 0.6, 2)
        w1, w2 = rng.uniform(0.8, 2.0, 2)
        p1, p2 = rng.uniform(-0.5, 0.5, 2)
        u = lambda x, y: x + 0.5 * y + 0.3 * x * y
        alpha = (lambda x, y:
                 1.5 + a1 * jnp.sin(w1 * x + p1) * jnp.cos(w2 * y + p2))
        sigma = lambda x, y: 0.3 + a2 * jnp.cos(w2 * x) ** 2
        prob, u_exact = autodiff_manufactured(
            u, alpha, sigma, dirichlet=square_loop(1.0))
        pts = np.array([[0.0, 0.0], [0.4, -0.3]], np.float32)
        s = WoStSolver(prob, SolverOptions(target_slots=8192))
        r = s.solve(pts, n_walks=4000, max_steps=600, eps=1e-3,
                    seed=300 + trial)
        dev = np.abs(r.mean - u_exact(pts)) / np.maximum(r.stderr, 1e-12)
        assert (dev < 4.5).all(), (trial, r.mean, u_exact(pts), dev)


def test_open_dirichlet_boundary_warns():
    # The fuzz harness itself first hit this footgun: from_points does
    # NOT close the loop, and a Dirichlet-only problem with a gap lets
    # walkers escape (1e25-scale values, NaN stderr). The Problem
    # constructor must warn; closed loops and legitimate open-Dirichlet
    # + Neumann half-space setups must stay quiet.
    import warnings

    from dcrmontecarlo_tpu.geometry import square_loop

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        Problem(dirichlet=Polyline.from_points([[0, 0], [1, 0], [1, 1]]),
                bc_dirichlet=lambda x, y: 0 * x)
    assert any("escape" in str(x.message) for x in w)

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        Problem(dirichlet=square_loop(1.0), bc_dirichlet=lambda x, y: 0 * x)
    assert not any("escape" in str(x.message) for x in w)

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        Problem(
            dirichlet=Polyline.from_points(
                [[-1, 0], [-1, -1], [1, -1], [1, 0]]),
            neumann=Polyline.from_points([[-1, 0], [1, 0]]),
            bc_dirichlet=lambda x, y: 0 * x,
        )
    assert not any("escape" in str(x.message) for x in w)

    # a T-junction (interior partition wall meeting a closed loop) is
    # odd-degree at the junction vertices but geometrically closed: no
    # gap, no warning (only degree-1 endpoints are escapes)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        Problem(
            dirichlet=Polyline.concat([
                Polyline.from_points(  # closed loop w/ vertices at (+-1, 0)
                    [[-1, -1], [1, -1], [1, 0], [1, 1],
                     [-1, 1], [-1, 0], [-1, -1]]),
                Polyline.from_points([[-1.0, 0.0], [1.0, 0.0]]),
            ]),
            bc_dirichlet=lambda x, y: 0 * x,
        )
    assert not any("escape" in str(x.message) for x in w)


def test_fuzz_random_neumann_robin_mms():
    # Randomized mixed-boundary MMS: u = cos(k x) cosh(k y) has zero flux
    # at y = 0 for ANY k, and alpha = exp(q y) puts a random coefficient
    # gradient ON the wall — each draw exercises the Robin machinery at a
    # different bias scale with a wall field that curves along the wall.
    import jax.numpy as jnp

    from dcrmontecarlo_tpu.models import autodiff_manufactured

    rng = np.random.default_rng(21)
    for trial in range(2):
        k = float(rng.uniform(0.4, 0.9))
        q = float(rng.uniform(0.2, 0.6))
        u = lambda x, y: jnp.cos(k * x) * jnp.cosh(k * y)
        alpha = lambda x, y: jnp.exp(q * y) + 0.0 * x
        prob, u_exact = autodiff_manufactured(
            u, alpha,
            dirichlet=Polyline.from_points(
                [[-2.0, 0.0], [-2.0, -3.0], [2.0, -3.0], [2.0, 0.0]]),
            neumann=Polyline.from_points([[-2.0, 0.0], [2.0, 0.0]]))
        s = WoStSolver(prob, SolverOptions(target_slots=16384))
        pts = np.array([[0.3, -0.15], [-1.0, -0.4]], np.float32)
        r = s.solve(pts, n_walks=8000, max_steps=1500, eps=0.02,
                    seed=400 + trial)
        dev = np.abs(r.mean - u_exact(pts)) / np.maximum(r.stderr, 1e-12)
        assert (dev < 4.5).all(), (trial, k, q, r.mean, u_exact(pts), dev)
