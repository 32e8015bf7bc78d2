"""Dense grid min/max scan of a scalar field (C8 rebuild).

The reference evaluates the field point-by-point in a Python loop, skipping
NaN/Inf/raising points (``gridSampleMinMax``, ``utils.py:65-120``). Here the
scan is a single vmapped evaluation of the whole grid on device; non-finite
values are masked out of the reduction.
"""

from typing import Callable, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["grid_min_max"]


def grid_min_max(
    f: Callable,
    bounds: Sequence[Tuple[float, float]],
    resolution: int = 100,
):
    """Min/max of a scalar field over a rectangular grid.

    Supports 1D/2D/3D domains like the reference (``utils.py:86-96``):
    ``f`` takes one coordinate argument per dimension.

    Args:
        f: scalar field ``f(x)``, ``f(x, y)`` or ``f(x, y, z)``
            (jnp-traceable).
        bounds: per-dimension ``(min, max)`` pairs.
        resolution: grid points per dimension (reference default 100;
            the solver's sigma-bar scan uses 50, ``WoStSolver.py:130``).

    Returns:
        ``(min_val, max_val, min_pt, max_pt)`` as host floats / np arrays.
    """
    ndim = len(bounds)
    if ndim not in (1, 2, 3):
        raise ValueError(f"grid scan supports 1-3 dimensions, got {ndim}")
    axes = [jnp.linspace(lo, hi, resolution) for lo, hi in bounds]
    grids = jnp.meshgrid(*axes, indexing="ij")
    coords = [g.ravel() for g in grids]
    vals = jax.vmap(f)(*coords)
    finite = jnp.isfinite(vals)
    if not bool(jnp.any(finite)):
        raise ValueError("field could not be evaluated at any grid point")
    big = jnp.float32(3e38)
    vmin = jnp.where(finite, vals, big)
    vmax = jnp.where(finite, vals, -big)
    imin = int(jnp.argmin(vmin))
    imax = int(jnp.argmax(vmax))
    pts = np.stack([np.asarray(c) for c in coords], axis=1)
    return (
        float(vals[imin]),
        float(vals[imax]),
        pts[imin],
        pts[imax],
    )
