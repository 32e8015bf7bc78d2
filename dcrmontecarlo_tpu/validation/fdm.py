"""Finite-difference/volume oracle for cross-validating the MC solver.

TPU-CI replacement for the reference's external SimPEG FEM oracle
(``tests/testNotebook.ipynb`` cells 5-15, ``Simulation2DNodal`` on a
TreeMesh): a self-contained scipy.sparse finite-volume discretization of

    ``-div(alpha grad u) + sigma u = f``

on a rectangular grid with Dirichlet sides/bottom and an optional zero-flux
(Neumann) top surface — exactly the DCR half-space geometry. Face
conductivities use harmonic averaging; the Neumann condition is imposed by
mirror ghost cells. Accuracy is second order in the grid spacing, far
tighter than MC error at the resolutions used in tests.
"""

from typing import Callable, Optional, Tuple

import numpy as np
import scipy.sparse as sps
import scipy.sparse.linalg as spla

__all__ = ["fdm_solve", "FDMSolution"]


class FDMSolution:
    """Grid solution with bilinear interpolation at arbitrary points."""

    def __init__(self, xs, ys, u):
        self.xs = xs
        self.ys = ys
        self.u = u  # (nx, ny)

    def __call__(self, points) -> np.ndarray:
        pts = np.asarray(points, np.float64).reshape(-1, 2)
        xs, ys, u = self.xs, self.ys, self.u
        fx = np.clip((pts[:, 0] - xs[0]) / (xs[1] - xs[0]), 0, len(xs) - 1.000001)
        fy = np.clip((pts[:, 1] - ys[0]) / (ys[1] - ys[0]), 0, len(ys) - 1.000001)
        ix = fx.astype(int)
        iy = fy.astype(int)
        tx = fx - ix
        ty = fy - iy
        return (
            (1 - tx) * (1 - ty) * u[ix, iy]
            + tx * (1 - ty) * u[ix + 1, iy]
            + (1 - tx) * ty * u[ix, iy + 1]
            + tx * ty * u[ix + 1, iy + 1]
        )


def fdm_solve(
    bounds: Tuple[Tuple[float, float], Tuple[float, float]],
    alpha: Callable,
    source: Callable,
    sigma: Optional[Callable] = None,
    bc: Optional[Callable] = None,
    neumann_top: bool = False,
    nx: int = 257,
    ny: int = 257,
) -> FDMSolution:
    """Solve ``-div(alpha grad u) + sigma u = f`` on a rectangle.

    Args:
        bounds: ``((x0, x1), (y0, y1))``.
        alpha, source, sigma: numpy-vectorized fields ``f(X, Y)``.
        bc: Dirichlet boundary value field (default 0). Applied on all four
            sides, or on sides+bottom only when ``neumann_top`` is set.
        neumann_top: zero-flux condition on the ``y = y1`` row (the DCR
            air-interface convention, ``testGeophysicalScenario.py:98-106``).
    """
    (x0, x1), (y0, y1) = bounds
    xs = np.linspace(x0, x1, nx)
    ys = np.linspace(y0, y1, ny)
    hx = xs[1] - xs[0]
    hy = ys[1] - ys[0]
    X, Y = np.meshgrid(xs, ys, indexing="ij")
    A = np.asarray(alpha(X, Y), np.float64)
    if A.shape != X.shape:
        A = np.broadcast_to(A, X.shape).copy()
    F = np.asarray(source(X, Y), np.float64)
    if F.shape != X.shape:
        F = np.broadcast_to(F, X.shape).copy()
    S = np.zeros_like(X) if sigma is None else np.broadcast_to(
        np.asarray(sigma(X, Y), np.float64), X.shape
    )

    def harmonic(a, b):
        return 2.0 * a * b / np.maximum(a + b, 1e-300)

    # face conductivities
    ax_e = np.zeros_like(A)  # east face of (i, j): between i and i+1
    ax_e[:-1, :] = harmonic(A[:-1, :], A[1:, :])
    ay_n = np.zeros_like(A)  # north face of (i, j): between j and j+1
    ay_n[:, :-1] = harmonic(A[:, :-1], A[:, 1:])

    n = nx * ny
    idx = lambda i, j: i * ny + j

    interior_mask = np.zeros((nx, ny), bool)
    interior_mask[1:-1, 1:-1] = True
    if neumann_top:
        interior_mask[1:-1, -1] = True  # top row is an unknown (ghost flux 0)

    rows, cols, vals = [], [], []
    rhs = np.zeros(n)

    I, J = np.nonzero(interior_mask)
    for i, j in zip(I, J):
        k = idx(i, j)
        cw = ax_e[i - 1, j] / hx**2
        ce = ax_e[i, j] / hx**2
        cs = ay_n[i, j - 1] / hy**2
        cn = ay_n[i, j] / hy**2 if j < ny - 1 else 0.0  # top ghost: zero flux
        diag = cw + ce + cs + cn + S[i, j]
        rows.append(k)
        cols.append(k)
        vals.append(diag)
        for (ii, jj, c) in ((i - 1, j, cw), (i + 1, j, ce), (i, j - 1, cs),
                            (i, j + 1, cn)):
            if c == 0.0:
                continue
            rows.append(k)
            cols.append(idx(ii, jj))
            vals.append(-c)
        rhs[k] = F[i, j]

    # Dirichlet rows
    dir_mask = ~interior_mask
    DI, DJ = np.nonzero(dir_mask)
    bc_vals = np.zeros((nx, ny)) if bc is None else np.broadcast_to(
        np.asarray(bc(X, Y), np.float64), X.shape
    )
    for i, j in zip(DI, DJ):
        k = idx(i, j)
        rows.append(k)
        cols.append(k)
        vals.append(1.0)
        rhs[k] = bc_vals[i, j]

    M = sps.csr_matrix((vals, (rows, cols)), shape=(n, n))
    u = spla.spsolve(M, rhs).reshape(nx, ny)
    return FDMSolution(xs, ys, u)
