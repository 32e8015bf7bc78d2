"""Modified Bessel functions I0/K0 as pure-jnp TPU primitives.

The reference uses host-side ``scipy.special.i0 / k0`` inside the walk loop
(reference ``solvers/utils.py:1,21-26,43-44``), which forces a device->host
round trip per call. Here they are polynomial approximations (Abramowitz &
Stegun 9.8.1-9.8.8) evaluated on the VPU, so the screened Green's function
math stays fused inside the compiled step function.

Exponentially-scaled variants ``i0e``/``k0e`` are provided because
``I0(x) ~ e^x`` overflows float32 near ``x = 88``; the solver only ever
needs ratios like ``1/I0`` and ``K0/I0`` which are computed stably from the
scaled forms.

Accuracy: |rel err| < 2e-7 in float64, < ~1e-6 in float32 (A&S bounds),
validated against scipy in ``tests/test_bessel_greens.py``.
"""

import jax.numpy as jnp

__all__ = ["i0", "i0e", "k0", "k0e", "i1", "i1e", "k1", "k1e"]

# A&S 9.8.1: I0(x), |x| <= 3.75, t = (x/3.75)^2
_I0_SMALL = (1.0, 3.5156229, 3.0899424, 1.2067492, 0.2659732, 0.0360768, 0.0045813)
# A&S 9.8.2: I0(x) x >= 3.75, e^-x sqrt(x) I0(x) = P(3.75/x)
_I0_LARGE = (
    0.39894228, 0.01328592, 0.00225319, -0.00157565, 0.00916281,
    -0.02057706, 0.02635537, -0.01647633, 0.00392377,
)
# A&S 9.8.5: K0(x), 0 < x <= 2, t = (x/2)^2:
#   K0 = -ln(x/2) I0(x) + P(t)
_K0_SMALL = (-0.57721566, 0.42278420, 0.23069756, 0.03488590, 0.00262698,
             0.00010750, 0.00000740)
# A&S 9.8.6: K0(x), x >= 2, t = 2/x: e^x sqrt(x) K0(x) = P(t)
_K0_LARGE = (1.25331414, -0.07832358, 0.02189568, -0.01062446, 0.00587872,
             -0.00251540, 0.00053208)


def _polyval(coeffs, t):
    acc = jnp.zeros_like(t) + coeffs[-1]
    for c in reversed(coeffs[:-1]):
        acc = acc * t + c
    return acc


def _i0_small(x):
    t = (x / 3.75) ** 2
    return _polyval(_I0_SMALL, t)


def _i0e_large(x):
    # e^{-x} I0(x) for x >= 3.75
    t = 3.75 / x
    return _polyval(_I0_LARGE, t) / jnp.sqrt(x)


def i0e(x):
    """Exponentially scaled modified Bessel function: ``e^{-|x|} I0(x)``."""
    x = jnp.abs(x)
    small = _i0_small(x) * jnp.exp(-x)
    # guard the large branch against x=0 division
    xs = jnp.maximum(x, 3.75)
    return jnp.where(x < 3.75, small, _i0e_large(xs))


def i0(x):
    """Modified Bessel function of the first kind, order 0."""
    x = jnp.abs(x)
    xs = jnp.maximum(x, 3.75)
    return jnp.where(x < 3.75, _i0_small(x), _i0e_large(xs) * jnp.exp(xs))


def _k0_small(x):
    t = (x / 2.0) ** 2
    return -jnp.log(x / 2.0) * _i0_small(x) + _polyval(_K0_SMALL, t)


def _k0e_large(x):
    # e^{x} K0(x) for x >= 2
    t = 2.0 / x
    return _polyval(_K0_LARGE, t) / jnp.sqrt(x)


def k0(x):
    """Modified Bessel function of the second kind, order 0 (x > 0)."""
    xc = jnp.maximum(x, 1e-30)  # K0 -> +inf as x -> 0+
    xs = jnp.maximum(xc, 2.0)
    return jnp.where(xc <= 2.0, _k0_small(jnp.minimum(xc, 2.0)),
                     _k0e_large(xs) * jnp.exp(-xs))


def k0e(x):
    """Exponentially scaled: ``e^{x} K0(x)`` (x > 0)."""
    xc = jnp.maximum(x, 1e-30)
    xs = jnp.maximum(xc, 2.0)
    return jnp.where(xc <= 2.0, _k0_small(jnp.minimum(xc, 2.0)) * jnp.exp(xc),
                     _k0e_large(xs))


# A&S 9.8.3: I1(x)/x for |x| <= 3.75, t = (x/3.75)^2
_I1_SMALL = (0.5, 0.87890594, 0.51498869, 0.15084934, 0.02658733,
             0.00301532, 0.00032411)
# A&S 9.8.4: x >= 3.75, e^-x sqrt(x) I1(x) = P(3.75/x)
_I1_LARGE = (
    0.39894228, -0.03988024, -0.00362018, 0.00163801, -0.01031555,
    0.02282967, -0.02895312, 0.01787654, -0.00420059,
)
# A&S 9.8.7: 0 < x <= 2, x K1(x) = x ln(x/2) I1(x) + P((x/2)^2)
_K1_SMALL = (1.0, 0.15443144, -0.67278579, -0.18156897, -0.01919402,
             -0.00110404, -0.00004686)
# A&S 9.8.8: x >= 2, e^x sqrt(x) K1(x) = P(2/x)
_K1_LARGE = (1.25331414, 0.23498619, -0.03655620, 0.01504268, -0.00780353,
             0.00325614, -0.00068245)


def _i1_small(x):
    t = (x / 3.75) ** 2
    return x * _polyval(_I1_SMALL, t)


def _i1e_large(x):
    t = 3.75 / x
    return _polyval(_I1_LARGE, t) / jnp.sqrt(x)


def i1e(x):
    """Exponentially scaled modified Bessel function: ``e^{-|x|} I1(x)``."""
    x = jnp.abs(x)
    small = _i1_small(x) * jnp.exp(-x)
    xs = jnp.maximum(x, 3.75)
    return jnp.where(x < 3.75, small, _i1e_large(xs))


def i1(x):
    """Modified Bessel function of the first kind, order 1 (x >= 0)."""
    x = jnp.abs(x)
    xs = jnp.maximum(x, 3.75)
    return jnp.where(x < 3.75, _i1_small(x), _i1e_large(xs) * jnp.exp(xs))


def _k1_small(x):
    t = (x / 2.0) ** 2
    return (jnp.log(x / 2.0) * _i1_small(x) + _polyval(_K1_SMALL, t) / x)


def _k1e_large(x):
    t = 2.0 / x
    return _polyval(_K1_LARGE, t) / jnp.sqrt(x)


def k1(x):
    """Modified Bessel function of the second kind, order 1 (x > 0)."""
    xc = jnp.maximum(x, 1e-30)  # K1 ~ 1/x as x -> 0+
    xs = jnp.maximum(xc, 2.0)
    return jnp.where(xc <= 2.0, _k1_small(jnp.minimum(xc, 2.0)),
                     _k1e_large(xs) * jnp.exp(-xs))


def k1e(x):
    """Exponentially scaled: ``e^{x} K1(x)`` (x > 0)."""
    xc = jnp.maximum(x, 1e-30)
    xs = jnp.maximum(xc, 2.0)
    return jnp.where(xc <= 2.0, _k1_small(jnp.minimum(xc, 2.0)) * jnp.exp(xc),
                     _k1e_large(xs))
