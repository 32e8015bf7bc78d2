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
    """Min/max of ``f(x, y)`` over a rectangular grid.

    Args:
        f: scalar field ``f(x, y)`` (jnp-traceable).
        bounds: ``((x_min, x_max), (y_min, y_max))``.
        resolution: grid points per dimension (reference default 100;
            the solver's sigma-bar scan uses 50, ``WoStSolver.py:130``).

    Returns:
        ``(min_val, max_val, min_pt, max_pt)`` as host floats / np arrays.
    """
    (x0, x1), (y0, y1) = bounds
    xs = jnp.linspace(x0, x1, resolution)
    ys = jnp.linspace(y0, y1, resolution)
    X, Y = jnp.meshgrid(xs, ys, indexing="ij")
    vals = jax.vmap(f)(X.ravel(), Y.ravel())
    finite = jnp.isfinite(vals)
    if not bool(jnp.any(finite)):
        raise ValueError("field could not be evaluated at any grid point")
    big = jnp.float32(3e38)
    vmin = jnp.where(finite, vals, big)
    vmax = jnp.where(finite, vals, -big)
    imin = int(jnp.argmin(vmin))
    imax = int(jnp.argmax(vmax))
    pts = np.stack([np.asarray(X.ravel()), np.asarray(Y.ravel())], axis=1)
    return (
        float(vals[imin]),
        float(vals[imax]),
        pts[imin],
        pts[imax],
    )
