"""Bessel/Green's function unit tests against the scipy oracle.

Tier-1 exact-value tests in the spirit of the reference's geometry tests
(``PolylinesSimple.py:309-361``); the reference itself calls scipy at
runtime (``solvers/utils.py:1``), so scipy is the natural oracle.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import scipy.special as sp


@pytest.fixture(autouse=True)
def _x64():
    # double precision for oracle comparisons; float32 accuracy has its own test
    with jax.enable_x64(True):
        yield

from dcrmontecarlo_tpu.ops import (
    i0,
    i0e,
    k0,
    k0e,
    greens_2d,
    greens_norm_2d,
    screened_greens_2d,
    screened_greens_norm_2d,
    screened_interior_prob,
)


def test_i0_matches_scipy():
    x = np.concatenate([np.linspace(0.0, 3.74, 200), np.linspace(3.76, 60, 200)])
    got = np.asarray(i0(jnp.asarray(x, jnp.float64)))
    want = sp.i0(x)
    np.testing.assert_allclose(got, want, rtol=5e-7)


def test_i0e_matches_scipy():
    x = np.linspace(0.0, 500.0, 500)
    got = np.asarray(i0e(jnp.asarray(x, jnp.float64)))
    want = sp.i0e(x)
    np.testing.assert_allclose(got, want, rtol=5e-7)


def test_k0_matches_scipy():
    x = np.concatenate([np.linspace(1e-3, 2.0, 200), np.linspace(2.01, 30, 200)])
    got = np.asarray(k0(jnp.asarray(x, jnp.float64)))
    want = sp.k0(x)
    np.testing.assert_allclose(got, want, rtol=2e-6)


def test_k0e_matches_scipy():
    x = np.linspace(1e-2, 500.0, 500)
    got = np.asarray(k0e(jnp.asarray(x, jnp.float64)))
    want = sp.k0e(x)
    np.testing.assert_allclose(got, want, rtol=2e-6)


def test_float32_accuracy():
    x = np.linspace(0.05, 80.0, 300).astype(np.float32)
    np.testing.assert_allclose(np.asarray(i0e(jnp.asarray(x))), sp.i0e(x), rtol=3e-5)
    np.testing.assert_allclose(np.asarray(k0e(jnp.asarray(x))), sp.k0e(x), rtol=3e-5)


def test_greens_norm_is_disk_integral():
    # int_0^R ln(R/r)/(2pi) * 2 pi r dr = R^2/4
    R = 1.7
    r = np.linspace(1e-6, R, 200000)
    integral = np.trapezoid(np.asarray(greens_2d(jnp.asarray(r), R)) * 2 * np.pi * r, r)
    np.testing.assert_allclose(integral, float(greens_norm_2d(R)), rtol=1e-4)


def test_screened_norm_is_disk_integral():
    R, sb = 1.3, 2.5
    r = np.linspace(1e-7, R, 400000)
    g = np.asarray(screened_greens_2d(jnp.asarray(r, jnp.float64), R, sb))
    integral = np.trapezoid(g * 2 * np.pi * r, r)
    np.testing.assert_allclose(
        integral, float(screened_greens_norm_2d(R, sb)), rtol=1e-3
    )


def test_screened_matches_reference_formula():
    # reference screenedGreens2D (solvers/utils.py:5-26) with scipy directly
    R, sb = 2.0, 3.0
    r = np.linspace(1e-3, R, 50)
    want = (sp.k0(r * np.sqrt(sb)) - sp.k0(R * np.sqrt(sb)) / sp.i0(R * np.sqrt(sb))
            * sp.i0(r * np.sqrt(sb))) / (2 * np.pi)
    got = np.asarray(screened_greens_2d(jnp.asarray(r, jnp.float64), R, sb))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_interior_prob_in_unit_interval():
    R = jnp.asarray([0.01, 0.1, 1.0, 10.0, 300.0])
    p = np.asarray(screened_interior_prob(R, 5.0))
    assert np.all(p >= 0.0) and np.all(p <= 1.0)
    assert p[0] < 0.05 and p[-1] > 0.999


def test_bessel_integrals_match_scipy():
    # iti0k0 is scipy's oracle for int_0^z I0 and int_0^z K0 (the Robin
    # reflectance coefficient's ingredients, ops/bessel.py ii0e/ik0)
    from dcrmontecarlo_tpu.ops.bessel import ii0e, ik0

    z = np.concatenate([
        np.linspace(1e-6, 3.74, 200),
        np.linspace(3.76, 50.0, 200),
        np.linspace(51.0, 600.0, 100),
    ])
    ii0_ref, ik0_ref = sp.iti0k0(z)
    np.testing.assert_allclose(
        np.asarray(ii0e(jnp.asarray(z, jnp.float64))),
        ii0_ref * np.exp(-z), rtol=5e-5)
    np.testing.assert_allclose(
        np.asarray(ik0(jnp.asarray(z, jnp.float64))), ik0_ref, rtol=5e-5)


def test_screened_chord_integral_is_line_integral():
    # J(r) = int_0^r G_s(t; r, sigma_bar) dt by quadrature, across both
    # the series (z <= 2) and scaled-Bessel (z > 2) regimes, plus the
    # unscreened limit J -> r/(2 pi) as sigma_bar -> 0.
    from dcrmontecarlo_tpu.ops import screened_chord_integral

    for r, sb in [(0.1, 0.5), (1.0, 1.0), (2.0, 9.0), (5.0, 4.0),
                  (50.0, 0.04)]:
        t = np.linspace(1e-9, r, 400000)
        g = np.asarray(
            screened_greens_2d(jnp.asarray(t, jnp.float64), r, sb))
        want = np.trapezoid(g, t)
        got = float(screened_chord_integral(
            jnp.asarray(r, jnp.float64), sb))
        np.testing.assert_allclose(got, want, rtol=2e-4)
    np.testing.assert_allclose(
        float(screened_chord_integral(jnp.asarray(1.3, jnp.float64), 1e-12)),
        1.3 / (2 * np.pi), rtol=1e-6)
