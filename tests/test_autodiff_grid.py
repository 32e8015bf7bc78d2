"""Differential-operator and grid-scan unit tests (C13 parity,
``utils.py:133-233`` of the reference: analytic gradient/Laplacian values
and grid min/max locations)."""

import numpy as np
import jax.numpy as jnp

from dcrmontecarlo_tpu.utils import (
    gradient,
    grid_min_max,
    laplacian,
    value_grad_laplacian,
)


def test_gradient_quadratic():
    # f = x^2 + 3y^2 -> grad = (2x, 6y)   (reference test_torchGradient)
    f = lambda x, y: x * x + 3.0 * y * y
    gx, gy = gradient(f)(2.0, -1.0)
    np.testing.assert_allclose([gx, gy], [4.0, -6.0], rtol=1e-6)


def test_gradient_product():
    f = lambda x, y: x * y + jnp.sin(x)
    gx, gy = gradient(f)(1.0, 2.0)
    np.testing.assert_allclose([gx, gy], [2.0 + np.cos(1.0), 1.0], rtol=1e-6)


def test_laplacian_quartic():
    # f = x^4 + y^4 -> lap = 12x^2 + 12y^2  (reference test_torchLaplacian)
    f = lambda x, y: x**4 + y**4
    lap = laplacian(f)(1.0, 2.0)
    np.testing.assert_allclose(lap, 12.0 + 48.0, rtol=1e-6)


def test_laplacian_harmonic_is_zero():
    f = lambda x, y: x * x - y * y
    np.testing.assert_allclose(laplacian(f)(0.7, -0.3), 0.0, atol=1e-6)


def test_value_grad_laplacian_fused():
    f = lambda x, y: x * x * y
    v, (gx, gy), lap = value_grad_laplacian(f)(2.0, 3.0)
    np.testing.assert_allclose([v, gx, gy, lap], [12.0, 12.0, 4.0, 6.0], rtol=1e-6)


def test_grid_min_max_paraboloid():
    # reference test_gridSampleMinMax: min of (x-0.5)^2+(y+0.25)^2 at
    # (0.5, -0.25), max at the farthest corner
    f = lambda x, y: (x - 0.5) ** 2 + (y + 0.25) ** 2
    mn, mx, pmin, pmax = grid_min_max(f, ((-1, 1), (-1, 1)), resolution=81)
    np.testing.assert_allclose(mn, 0.0, atol=1e-3)
    np.testing.assert_allclose(pmin, [0.5, -0.25], atol=0.03)
    np.testing.assert_allclose(pmax, [-1.0, 1.0], atol=1e-6)


def test_grid_min_max_skips_nonfinite():
    # points where the field is NaN/Inf must be ignored
    # (reference utils.py:100-106)
    def f(x, y):
        v = x + y
        return jnp.where(x > 0.5, jnp.nan, jnp.where(y > 0.5, jnp.inf, v))

    mn, mx, _, _ = grid_min_max(f, ((-1, 1), (-1, 1)), resolution=41)
    assert np.isfinite(mn) and np.isfinite(mx)
    np.testing.assert_allclose(mn, -2.0, atol=1e-6)
    np.testing.assert_allclose(mx, 1.0, atol=1e-6)


def test_grid_min_max_1d_and_3d():
    # reference gridSampleMinMax supports ndim 1-3 (utils.py:86-96)
    f1 = lambda x: (x - 0.25) ** 2
    mn, mx, pmin, pmax = grid_min_max(f1, ((-1, 1),), resolution=81)
    np.testing.assert_allclose(pmin[0], 0.25, atol=0.03)
    np.testing.assert_allclose(pmax[0], -1.0, atol=1e-6)

    f3 = lambda x, y, z: x * x + y * y + z * z
    mn, mx, pmin, pmax = grid_min_max(f3, ((-1, 1), (-1, 1), (-1, 1)),
                                      resolution=11)
    np.testing.assert_allclose(mn, 0.0, atol=1e-6)
    np.testing.assert_allclose(mx, 3.0, atol=1e-6)
