"""Differentiable scalar-field builders (C9 rebuild + conveniences).

Fields are plain jnp-traceable functions ``f(x, y) -> scalar`` — the
framework's canonical coefficient/BC/source signature. They compose under
``jax.grad`` (needed by the delta-tracking coefficient transform) and
``jax.vmap`` (walker batching).
"""

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

__all__ = [
    "smooth_circle",
    "constant",
    "gaussian_bump",
    "gaussian_dipole",
    "GaussianMixture",
    "dipole_importance",
]


class GaussianMixture(NamedTuple):
    """Isotropic Gaussian mixture used as a source importance density.

    Next-event estimation of near-point sources (regularized current
    electrodes) from the Green's-weighted density alone has heavy-tailed
    weights (``~ r^2/4 * f_peak``); sampling *toward the source* from this
    mixture and combining via the MIS balance heuristic bounds them.
    All fields are arrays over the ``k`` components.
    """

    cx: jnp.ndarray      # (k,)
    cy: jnp.ndarray      # (k,)
    width: jnp.ndarray   # (k,) Gaussian sigma
    weight: jnp.ndarray  # (k,) normalized positive mixture weights

    @staticmethod
    def from_components(components):
        """``components``: iterable of ``(center, width, weight)``."""
        cx = np.asarray([c[0][0] for c in components], np.float32)
        cy = np.asarray([c[0][1] for c in components], np.float32)
        w = np.asarray([c[1] for c in components], np.float32)
        a = np.abs(np.asarray([c[2] for c in components], np.float32))
        a = a / a.sum()
        return GaussianMixture(jnp.asarray(cx), jnp.asarray(cy),
                               jnp.asarray(w), jnp.asarray(a))

    def sample(self, u_sel, u1, u2):
        """Draw one point per lane: component by ``u_sel``, offset by
        Box-Muller normals from ``(u1, u2)``."""
        cum = jnp.cumsum(self.weight)
        idx = jnp.sum((u_sel[..., None] > cum[None, :]).astype(jnp.int32),
                      axis=-1)
        idx = jnp.clip(idx, 0, self.weight.shape[0] - 1)
        rad = jnp.sqrt(-2.0 * jnp.log(jnp.maximum(u1, 1e-12)))
        ang = 2.0 * jnp.pi * u2
        w = jnp.take(self.width, idx)
        x = jnp.take(self.cx, idx) + w * rad * jnp.cos(ang)
        y = jnp.take(self.cy, idx) + w * rad * jnp.sin(ang)
        return x, y

    def pdf(self, x, y):
        """Mixture density at ``(x, y)`` (2D normal components)."""
        dx = x[..., None] - self.cx
        dy = y[..., None] - self.cy
        w2 = self.width * self.width
        comp = jnp.exp(-(dx * dx + dy * dy) / (2.0 * w2)) / (2.0 * jnp.pi * w2)
        return jnp.sum(self.weight * comp, axis=-1)


def dipole_importance(pos_electrode, neg_electrode, width: float):
    """Importance mixture matching a :func:`gaussian_dipole` source."""
    return GaussianMixture.from_components([
        (pos_electrode, width, 0.5),
        (neg_electrode, width, 0.5),
    ])


def smooth_circle(center, radius, sharpness: float = 100.0):
    """Sigmoid-smoothed circle indicator: 1 inside, 0 outside.

    Rebuild of ``torch_smooth_circle`` (reference ``utils.py:123-129``):
    ``sigmoid(-sharpness * sdf)``. Two deliberate deviations:

    * ``jax.nn.sigmoid`` (overflow-safe with stable derivatives) — a
      naive ``1/(1+exp(-v))`` produces NaN gradients wherever the
      indicator saturates, which poisons the delta-tracking sigma' grid
      scan.
    * the sdf is the REGULARIZED ``sqrt(|x-c|^2 + w^2) - radius`` with
      ``w = min(1/sharpness, radius/2)`` instead of the exact distance:
      the exact ``hypot``'s Laplacian diverges like ``1/rho`` at the
      center, so ``sigma' ~ (Delta alpha)/alpha`` is UNBOUNDED there
      (measured 0.057 at 1 m from the notebook resistor's center vs
      0.0018 on a 128^2 scan) — no finite delta-tracking majorant
      exists and the collision-weight variance is log-divergent. The
      regularization changes the indicator only deep inside the circle
      where it is saturated anyway (max change ``~ sharpness * w *
      e^{-sharpness * radius}`` at the center — 0.25% for the notebook
      anomalies, and the reference's sharpness=100 default makes it
      ~e^{-100 r}), and bounds ``|Delta sdf| <= 1/w``.
    """
    cx, cy = float(center[0]), float(center[1])
    w2 = float(min(1.0 / sharpness, radius / 2.0)) ** 2

    def f(x, y):
        sdf = jnp.sqrt((x - cx) ** 2 + (y - cy) ** 2 + w2) - radius
        return jax.nn.sigmoid(-sharpness * sdf)

    return f


def constant(value: float):
    """Constant field (broadcasts against traced coordinates)."""

    def f(x, y):
        return value + 0.0 * x

    return f


def gaussian_bump(center, amplitude: float, width: float):
    """Isotropic Gaussian bump, e.g. the variable-diffusion field of
    ``tests/testWostVariableCoefficients.py:12-22``."""
    cx, cy = float(center[0]), float(center[1])

    def f(x, y):
        d2 = (x - cx) ** 2 + (y - cy) ** 2
        return amplitude * jnp.exp(-d2 / (2.0 * width * width))

    return f


def gaussian_dipole(
    pos_electrode,
    neg_electrode,
    current: float = 1.0,
    width: float = 0.5,
):
    """Gaussian-regularized +/- current dipole source.

    Rebuild of ``dcr_current_source`` (``tests/testGeophysicalScenario.py:
    11-33``): two opposite-signed Gaussians of total current ``current``
    normalized as 2D densities of width ``width``.
    """
    px, py = float(pos_electrode[0]), float(pos_electrode[1])
    nx, ny = float(neg_electrode[0]), float(neg_electrode[1])
    norm = current / (2.0 * jnp.pi * width * width)

    def f(x, y):
        dp = (x - px) ** 2 + (y - py) ** 2
        dn = (x - nx) ** 2 + (y - ny) ** 2
        return norm * (jnp.exp(-dp / (2 * width * width))
                       - jnp.exp(-dn / (2 * width * width)))

    return f
