"""Manufactured-solution problem definitions (rebuild of C14,
``tests/testWoStCorrectness.py:22-156``).

Each builder returns ``(Problem, u_exact)`` where ``u_exact(points)``
evaluates the analytic solution on an ``(N, 2)`` array.
"""

from typing import Callable, Tuple

import numpy as np
import jax.numpy as jnp

from ..geometry.polyline import square_loop
from ..problems.problem import Problem

__all__ = [
    "polynomial_manufactured",
    "trig_manufactured",
    "autodiff_manufactured",
    "interior_grid",
]


def polynomial_manufactured(domain_size: float = 2.0) -> Tuple[Problem, Callable]:
    """``u = (1-x^2)(1-y^2)``, ``D = 2 + 0.5x + 0.5y``, ``sigma = 2 + xy``
    (reference ``manufactured_solution_with_polynomial``,
    ``testWoStCorrectness.py:81-142``)."""

    def u_exact(pts):
        x, y = pts[:, 0], pts[:, 1]
        return (1 - x**2) * (1 - y**2)

    def alpha(x, y):
        return 2.0 + 0.5 * x + 0.5 * y

    def sigma(x, y):
        return 2.0 + x * y

    def bc(x, y):
        return (1 - x * x) * (1 - y * y)

    def source(x, y):
        u = (1 - x * x) * (1 - y * y)
        lap_u = -2 * (2 - x * x - y * y)
        D = 2 + 0.5 * x + 0.5 * y
        gradD_dot_gradu = -x * (1 - y * y) - y * (1 - x * x)
        return -(D * lap_u + gradD_dot_gradu) + (2 + x * y) * u

    prob = Problem(
        dirichlet=square_loop(domain_size / 2.0),
        bc_dirichlet=bc,
        source=source,
        alpha=alpha,
        sigma=sigma,
    )
    return prob, u_exact


def trig_manufactured(domain_size: float = 2.0) -> Tuple[Problem, Callable]:
    """``u = sin(pi x) sin(pi y)``, ``D = 2 + x``, ``sigma = y^2 + 1``
    (reference ``manufactured_solution_with_trig_function``,
    ``testWoStCorrectness.py:22-78`` — defined there but unused; exposed
    here as a second model)."""

    def u_exact(pts):
        x, y = pts[:, 0], pts[:, 1]
        return np.sin(np.pi * x) * np.sin(np.pi * y)

    def alpha(x, y):
        return x + 2.0

    def sigma(x, y):
        return y * y + 1.0

    def bc(x, y):
        return jnp.sin(jnp.pi * x) * jnp.sin(jnp.pi * y)

    def source(x, y):
        pi = jnp.pi
        u = jnp.sin(pi * x) * jnp.sin(pi * y)
        diffusion_term = 2 * pi**2 * (2 + x) * u
        gradD_dot_gradu = pi * jnp.cos(pi * x) * jnp.sin(pi * y)
        absorption_term = (y * y + 1) * u
        # f = -div(D grad u) + sigma u
        # (the reference's expression subtracts the absorption term —
        #  a sign slip in testWoStCorrectness.py:76; the correct
        #  manufactured source adds it, which is what we do here.)
        return diffusion_term - gradD_dot_gradu + absorption_term

    prob = Problem(
        dirichlet=square_loop(domain_size / 2.0),
        bc_dirichlet=bc,
        source=source,
        alpha=alpha,
        sigma=sigma,
    )
    return prob, u_exact


def interior_grid(domain_size: float = 2.0, n_points: int = 4, margin: float = 0.3):
    """Interior evaluation grid (reference ``create_test_points``,
    ``testWoStCorrectness.py:144-156``)."""
    half = domain_size / 2.0
    c = half - margin
    g = np.linspace(-c, c, n_points)
    X, Y = np.meshgrid(g, g, indexing="ij")
    return np.stack([X.ravel(), Y.ravel()], axis=1).astype(np.float32)


def autodiff_manufactured(
    u,
    alpha=None,
    sigma=None,
    dirichlet=None,
    neumann=None,
    **problem_kwargs,
) -> Tuple[Problem, Callable]:
    """Manufacture a problem for ANY ``u``/``alpha``/``sigma`` by autodiff.

    The reference derives every manufactured source by hand
    (``testWoStCorrectness.py:81-142`` — and gets a sign wrong in its trig
    variant); here the source

        ``f = -div(alpha grad u) + sigma u
           = -(alpha lap u + grad alpha . grad u) + sigma u``

    is built at trace time with ``jax.grad`` (``utils/autodiff.py``) from
    the SAME jnp-traceable callables the solver consumes, so arbitrary
    smooth coefficients and geometries become oracle-gated test problems
    with zero hand algebra.

    Args:
        u: jnp-traceable exact solution ``u(x, y)``. It is also used as
            the Dirichlet BC. If ``neumann`` walls are passed, the CALLER
            must choose ``u`` with zero normal derivative there (the
            solver imposes zero flux; a mismatch is a modelling error,
            not a solver bug).
        alpha, sigma: optional coefficient fields (defaults 1 / 0).
        dirichlet: boundary ``Polyline`` (default: unit square loop).

    Returns ``(Problem, u_exact)`` with ``u_exact`` evaluating ``u`` on an
    ``(N, 2)`` array.
    """
    import jax

    from ..utils.autodiff import gradient, laplacian

    if dirichlet is None:
        dirichlet = square_loop(1.0)
    a = alpha if alpha is not None else (lambda x, y: 1.0 + 0.0 * x)
    grad_u = gradient(u)
    lap_u = laplacian(u)
    grad_a = gradient(a)

    def source(x, y):
        gx, gy = grad_u(x, y)
        ax, ay = grad_a(x, y)
        f = -(a(x, y) * lap_u(x, y) + ax * gx + ay * gy)
        if sigma is not None:
            f = f + sigma(x, y) * u(x, y)
        return f

    prob = Problem(
        dirichlet=dirichlet,
        neumann=neumann,
        bc_dirichlet=u,
        source=source,
        alpha=alpha,
        sigma=sigma,
        **problem_kwargs,
    )

    u_vec = jax.jit(jax.vmap(u))

    def u_exact(pts):
        pts = np.asarray(pts, np.float32)
        return np.asarray(u_vec(jnp.asarray(pts[:, 0]), jnp.asarray(pts[:, 1])))

    return prob, u_exact
