"""Differentiable scalar-field builders (C9 rebuild + conveniences).

Fields are plain jnp-traceable functions ``f(x, y) -> scalar`` — the
framework's canonical coefficient/BC/source signature. They compose under
``jax.grad`` (needed by the delta-tracking coefficient transform) and
``jax.vmap`` (walker batching).
"""

import jax
import jax.numpy as jnp

__all__ = ["smooth_circle", "constant", "gaussian_bump", "gaussian_dipole"]


def smooth_circle(center, radius, sharpness: float = 100.0):
    """Sigmoid-smoothed circle indicator: 1 inside, 0 outside.

    Rebuild of ``torch_smooth_circle`` (reference ``utils.py:123-129``):
    ``sigmoid(-sharpness * sdf)`` with ``sdf = |x - c| - radius``.
    Uses ``jax.nn.sigmoid`` (overflow-safe with stable derivatives) — a
    naive ``1/(1+exp(-v))`` produces NaN gradients wherever the indicator
    saturates, which poisons the delta-tracking sigma' grid scan.
    """
    cx, cy = float(center[0]), float(center[1])

    def f(x, y):
        sdf = jnp.sqrt((x - cx) ** 2 + (y - cy) ** 2) - radius
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
