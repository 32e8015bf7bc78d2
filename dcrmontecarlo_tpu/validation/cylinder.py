"""Closed-form series oracle: line-current dipole over a buried cylinder.

The third, author-independent accuracy gate (round-5 verdict item 4).
The repo's two grid oracles (``validation/fdm.py``, ``validation/fem.py``)
are mutually O(h^2) but share every modelling convention, so a shared
blind spot passes both. This module solves the SAME physics from
textbook math that shares nothing with either grid code: the 2D
potential of line current sources in a conductive half-plane
(insulating surface, i.e. a zero-flux/Neumann top) containing one
circular inclusion of different conductivity,

    div(sigma grad u) = -sum_j I_j delta(x - s_j),   du/dy|_surface = 0,

via the classical Rayleigh multipole / image construction:

* the Neumann surface at ``y = ys`` is removed by mirroring every source
  AND the cylinder across it (full-plane, two symmetric disks: the
  symmetric solution has ``du/dy = 0`` on the symmetry line exactly);
* each disk's response to a regular incident field ``Re(alpha_n w^n)``
  is the exterior multipole ``Re(b_n w^-n)`` with
  ``b_n = k a^{2n} conj(alpha_n)``, ``k = (s0 - s1)/(s0 + s1)`` (the 2D
  per-harmonic transmission problem), and the interior field
  ``(1 + k) alpha_n w^n``;
* the two disks' mutual scattering couples through the 2D addition
  theorem ``(w - L)^{-m} = (-L)^{-m} sum_n binom(m+n-1, n) (w/L)^n``
  and converges geometrically at ratio ``~ k (a/L)^2`` (the mirror disk
  sits at ``L = 2 (ys - yc) > 2a``), so a fixed-point iteration over the
  multipole coefficients is exact to f64 roundoff within ~tens of
  iterations.

The solution SELF-CERTIFIES (``tests/test_cylinder_oracle.py``): it is
checked to satisfy the PDE (finite-difference Laplacian residual), both
interface conditions (continuity of ``u`` and of ``sigma du/dn`` across
the circle), and the surface Neumann condition — by uniqueness of the
boundary-value problem those checks, not trust in this derivation, are
what make it an oracle.

Reference parity: this plays the role SimPEG FEM plays in
``/root/reference/tests/testNotebook.ipynb`` (cells 5-15) — someone
else's math as ground truth — at notebook-like contrast and scale.
"""

from typing import Sequence, Tuple

import numpy as np
from scipy.special import roots_hermite, roots_legendre

__all__ = ["CylinderHalfspace", "regularize_sources"]


class CylinderHalfspace:
    """Series solution; evaluate with ``__call__(points)``.

    Args:
        center / radius: the buried cylinder (must satisfy
            ``center_y + radius < surface_y``).
        sigma0 / sigma1: background / cylinder conductivity.
        surface_y: the insulating (Neumann) surface height.
        sources: iterable of ``((x, y), I)`` line currents in the
            background medium (outside the cylinder, below the surface).
            Use a +/- pair (dipole) so the potential decays at infinity.
        n_terms: multipole truncation order. The coefficient tail decays
            like ``(a/L)^n`` on top of the source expansion's
            ``(a/d)^n``; 32 is far beyond f64 roundoff for any buried
            geometry.
        n_iter: fixed-point iterations (ratio ``~ |k| (a/L)^2``).
    """

    def __init__(self, center, radius, sigma0, sigma1, surface_y,
                 sources: Sequence[Tuple[Tuple[float, float], float]],
                 n_terms: int = 32, n_iter: int = 120):
        ys = float(surface_y)
        c = complex(center[0], center[1])
        a = float(radius)
        if c.imag + a >= ys:
            raise ValueError("cylinder must be strictly below the surface")
        s0, s1 = float(sigma0), float(sigma1)
        k = (s0 - s1) / (s0 + s1)
        # mirror across y = ys: M(z) = conj(z) + 2 i ys
        mirror = lambda z: np.conj(z) + 2j * ys
        c2 = mirror(c)
        L = c2 - c  # = 2i (ys - yc), |L| > 2a
        self._c, self._c2, self._a, self._ys = c, c2, a, ys
        self._s0, self._s1, self._k = s0, s1, k
        # physical + mirrored sources (equal strength: Neumann image)
        src = [(complex(p[0], p[1]), float(I)) for p, I in sources]
        for p, I in list(src):
            src.append((mirror(p), I))
        self._src = src

        n = np.arange(1, n_terms + 1)
        # source expansion about c:  -I/(2 pi s0) ln|z - s| =
        #   const + I/(2 pi s0) Re sum_n (1/n) d^-n w^n,  d = s - c
        alpha_src = np.zeros(n_terms, complex)
        a0 = 0.0
        for s, I in src:
            d = s - c
            if abs(d) <= a:
                raise ValueError("source inside the cylinder")
            alpha_src += (I / (2 * np.pi * s0)) * d ** (-n.astype(float)) / n
            a0 += -(I / (2 * np.pi * s0)) * np.log(abs(d))
        # translation matrix T[n-1, m-1]: coefficient of w^n from the
        # mirror disk's multipole conj(b_m) (z - c2)^{-m}
        m = n  # same range
        from scipy.special import comb

        T = ((-1.0) ** m[None, :]
             * comb(m[None, :] + n[:, None] - 1, n[:, None])
             * L ** (-(m[None, :] + n[:, None]).astype(float)))
        resp = k * a ** (2 * n.astype(float))  # b_n = resp * conj(alpha_n)
        b = resp * np.conj(alpha_src)
        for _ in range(n_iter):
            alpha = alpha_src + T @ np.conj(b)
            b_new = resp * np.conj(alpha)
            if np.max(np.abs(b_new - b)) <= 1e-300 + 1e-15 * np.max(
                    np.abs(b_new)):
                b = b_new
                break
            b = b_new
        alpha = alpha_src + T @ np.conj(b)
        # interior coefficients: beta_n = (1+k) alpha_n; beta_0 = alpha_0
        # (theta-average continuity; translation's n=0 terms included)
        a0 += float(np.real(np.sum(np.conj(b) * (-1.0) ** m
                                   * L ** (-m.astype(float)))))
        self._n = n
        self._b = b
        self._beta = (1.0 + k) * alpha
        self._beta0 = a0

    # ------------------------------------------------------------------ #
    def __call__(self, points) -> np.ndarray:
        """Potential at ``(N, 2)`` points with ``y <= surface_y``."""
        pts = np.asarray(points, np.float64).reshape(-1, 2)
        z = pts[:, 0] + 1j * pts[:, 1]
        w = z - self._c
        r = np.abs(w)
        inside = r < self._a
        out = np.zeros(len(z))
        # exterior: sources + both disks' multipoles
        ze = z[~inside]
        ue = np.zeros(len(ze))
        for s, I in self._src:
            ue += -(I / (2 * np.pi * self._s0)) * np.log(np.abs(ze - s))
        we = ze - self._c
        w2 = ze - self._c2
        for i, nn in enumerate(self._n):
            ue += np.real(self._b[i] * we ** (-float(nn))
                          + np.conj(self._b[i]) * w2 ** (-float(nn)))
        out[~inside] = ue
        # interior: regular series
        wi = w[inside]
        ui = np.full(len(wi), self._beta0)
        for i, nn in enumerate(self._n):
            ui += np.real(self._beta[i] * wi ** float(nn))
        out[inside] = ui
        return out

    # ---------------- self-certification probes ----------------------- #
    def interface_residuals(self, n_probe: int = 720):
        """Max |jump in u| and |jump in sigma du/dr| across the circle.

        Evaluated at ``r = a (1 -/+ h)`` with central differences for the
        radial flux; both residuals are O(h) probe error for an exact
        solution, so they certify the interface to ~1e-5 relative.
        """
        th = np.linspace(0.0, 2 * np.pi, n_probe, endpoint=False)
        h = 1e-5 * self._a
        cx, cy = self._c.real, self._c.imag
        rs = {}
        for tag, rr in (("in2", self._a - 2 * h), ("in1", self._a - h),
                        ("out1", self._a + h), ("out2", self._a + 2 * h)):
            pts = np.stack([cx + rr * np.cos(th), cy + rr * np.sin(th)], 1)
            rs[tag] = self(pts)
        u_in = 1.5 * rs["in1"] - 0.5 * rs["in2"]    # extrapolate to r=a
        u_out = 1.5 * rs["out1"] - 0.5 * rs["out2"]
        res_u = np.max(np.abs(u_in - u_out))
        f_in = self._s1 * (rs["in1"] - rs["in2"]) / h
        f_out = self._s0 * (rs["out2"] - rs["out1"]) / h
        res_f = np.max(np.abs(f_in - f_out))
        scale = max(1e-30, np.max(np.abs(u_out)))
        fscale = max(1e-30, np.max(np.abs(f_out)))
        return res_u / scale, res_f / fscale

    def surface_flux(self, xs, h: float = 1e-4):
        """|du/dy| on the surface (should vanish: Neumann certification)."""
        xs = np.asarray(xs, np.float64)
        lo = self(np.stack([xs, np.full_like(xs, self._ys - 2 * h)], 1))
        hi = self(np.stack([xs, np.full_like(xs, self._ys - h)], 1))
        # one-sided difference extrapolated to the surface
        return np.abs((hi - lo) / h)

    def laplacian_residual(self, points, h: float = 1e-3):
        """5-point Laplacian at source-free, interface-free points —
        normalized by the field's own second-derivative scale ``|u|/h``
        so it certifies harmonicity to FD truncation error."""
        pts = np.asarray(points, np.float64).reshape(-1, 2)
        u0 = self(pts)
        lap = -4.0 * u0
        for dx, dy in ((h, 0), (-h, 0), (0, h), (0, -h)):
            lap += self(pts + np.array([dx, dy]))
        return np.abs(lap) / (h * np.maximum(np.abs(u0), 1e-30))


def regularize_sources(make_solution, sources, width: float,
                       surface_y: float, n_nodes: int = 10):
    """Average a point-source solution over Gaussian-regularized sources.

    The MC problem's current electrodes are 2D Gaussians of sigma
    ``width`` TRUNCATED by the domain (mass above the surface simply
    never enters the walk — matching ``problems/fields.gaussian_dipole``
    evaluated only inside). By linearity in each source, the exact
    regularized potential is the same truncated-Gaussian average of the
    point-source series:

        u_reg(x) = sum_j I_j  int_{y' <= ys} rho_w(p - s_j) u_unit(x; p) dp

    (NO renormalization — the truncated tail's current is genuinely
    absent, exactly as in the discrete/MC models). Quadrature:
    Gauss-Hermite in x (full line), Gauss-Legendre in y over
    ``[s_y - 8 w, ys]`` with the Gaussian weight explicit — both
    spectrally accurate for this analytic integrand.

    Args:
        make_solution: ``sources -> CylinderHalfspace``-like callable.
        sources: ``[((x, y), I), ...]`` nominal electrode centers.
        width: Gaussian sigma of the regularization.
    Returns a callable ``u(points)``.
    """
    xh, wh = roots_hermite(n_nodes)          # int e^{-t^2} f dt
    yl, wl = roots_legendre(2 * n_nodes)
    sols = []
    for (sx, sy), I in sources:
        lo, hi = sy - 8.0 * width, float(surface_y)
        ym = 0.5 * (lo + hi) + 0.5 * (hi - lo) * yl
        wy = (0.5 * (hi - lo) * wl
              * np.exp(-(ym - sy) ** 2 / (2 * width * width))
              / (np.sqrt(2 * np.pi) * width))
        for tx, twx in zip(xh, wh):
            px = sx + np.sqrt(2.0) * width * tx
            for py, twy in zip(ym, wy):
                sols.append((twx / np.sqrt(np.pi) * twy,
                             make_solution([((px, py), I)])))

    def u(points):
        pts = np.asarray(points, np.float64).reshape(-1, 2)
        tot = np.zeros(len(pts))
        for wgt, s in sols:
            tot += wgt * s(pts)
        return tot

    return u
