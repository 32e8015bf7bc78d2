"""Radial source/interior-point samplers for the 2D ball.

TPU-native rebuild of the reference's rejection-sampled radius caches
(``solvers/utils.py:64-217``). The reference fills a host-side 10k-entry
cache by rejection sampling a *wrong* density (``-log r`` instead of the
Green's-weighted area density ``-r log(r/R)``; see SURVEY.md §5 quirk 2-3)
and rescales unit samples by the ball radius even for the non-scale-
invariant screened kernel. Both are replaced with exact device-side
sampling:

* **Green's radial density** ``p(r) = r ln(R/r) / (R^2/4)`` on ``(0, R)``
  has CDF ``F(s) = s^2 (1 - 2 ln s)`` for ``s = r/R``, which is exactly the
  law of ``s = sqrt(U1 * U2)`` for independent uniforms (the density of
  ``V = U1*U2`` is ``-ln v``, and ``s = sqrt(V)``). One fused expression,
  no rejection, no cache, no bias.

* **Screened Green's radial density** ``p(r) ∝ r G_s(r; R, sigma_bar)`` is
  not scale invariant (its shape depends on ``z = R sqrt(sigma_bar)``), so
  a per-problem inverse-CDF table ``s(z, u)`` is precomputed host-side in
  float64 (scipy Bessel) and bilinearly interpolated on device in
  ``(log z, u)``. For ``z`` below the table range the screened density
  converges to the unscreened one and the closed form above is used.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

__all__ = [
    "sample_greens_radius",
    "ScreenedRadialTable",
    "build_screened_radial_table",
    "sample_screened_radius",
    "sample_screened_radius_exact",
    "greens_radial_pdf",
    "screened_radial_pdf",
]


def sample_greens_radius(R, u1, u2):
    """Exact sample of the Green's-weighted radius in a ball of radius R.

    ``r = R * sqrt(u1 * u2)`` has density ``r ln(R/r)/(R^2/4)`` — the
    normalized radial marginal of ``G(x, y)`` over the 2D ball. Replaces
    ``GreensDistribution2D`` (``solvers/utils.py:120-151``).
    """
    return R * jnp.sqrt(u1 * u2)


def greens_radial_pdf(r, R):
    """Normalized Green's radial density ``r ln(R/r) / (R^2/4)``."""
    rc = jnp.clip(r, 1e-12, R)
    return jnp.where((r > 0) & (r < R), rc * jnp.log(R / rc) / (R * R / 4.0), 0.0)


class ScreenedRadialTable(NamedTuple):
    """Inverse-CDF table for the screened radial density (device arrays)."""

    log_z0: jnp.ndarray   # () log of smallest tabulated z
    dlog_z: jnp.ndarray   # () log-spacing of the z grid
    n_z: int
    n_u: int
    table: jnp.ndarray    # (n_z, n_u) normalized radius s in (0, 1)


def build_screened_radial_table(
    z_min: float = 1e-2,
    z_max: float = 1e3,
    n_z: int = 64,
    n_u: int = 128,
    n_s: int = 8192,
) -> ScreenedRadialTable:
    """Host-side (float64, scipy) construction of the inverse CDF of
    ``p(s) ∝ s [K0(z s) - (K0(z)/I0(z)) I0(z s)]`` on ``s ∈ (0, 1)``.

    Uses scaled Bessel functions so large ``z`` (deep screening) does not
    overflow: with ``i0e/k0e``, ``K0(zs) - c I0(zs)`` is evaluated as
    ``e^{-zs} [k0e(zs) - (k0e(z)/i0e(z)) e^{-2z(1-s)} i0e(zs)]`` and the
    common ``e^{-zs}`` scale cancels in the CDF normalization only if kept —
    so everything is computed in log-safe float64 directly.
    """
    from scipy.special import i0e, k0e

    zs = np.exp(np.linspace(np.log(z_min), np.log(z_max), n_z))
    # integration grid in s, denser near 0 where K0 diverges
    s = np.concatenate([
        np.geomspace(1e-7, 1e-2, n_s // 4, endpoint=False),
        np.linspace(1e-2, 1.0, n_s - n_s // 4),
    ])
    u_grid = np.linspace(0.0, 1.0, n_u)
    table = np.empty((n_z, n_u), np.float64)
    for i, z in enumerate(zs):
        x = z * s
        # K0(x) = k0e(x) e^{-x};  I0(x) = i0e(x) e^{x}
        # ratio c = K0(z)/I0(z) = (k0e(z)/i0e(z)) e^{-2z}
        log_c = np.log(k0e(z) / i0e(z)) - 2.0 * z
        # G ∝ k0e(x) e^{-x} - e^{log_c} i0e(x) e^{x}
        #   = e^{-x} [k0e(x) - i0e(x) e^{log_c + 2x}]
        g = np.exp(-x) * (k0e(x) - i0e(x) * np.exp(np.minimum(log_c + 2.0 * x, 700.0)))
        dens = np.maximum(s * g, 0.0)
        cdf = np.concatenate([[0.0], np.cumsum(0.5 * (dens[1:] + dens[:-1]) * np.diff(s))])
        cdf /= cdf[-1]
        # invert: s as a function of u (cdf is monotone)
        table[i] = np.interp(u_grid, cdf, s)
    return ScreenedRadialTable(
        log_z0=jnp.asarray(np.log(z_min), jnp.float32),
        dlog_z=jnp.asarray(
            (np.log(z_max) - np.log(z_min)) / (n_z - 1), jnp.float32
        ),
        n_z=n_z,
        n_u=n_u,
        table=jnp.asarray(table, jnp.float32),
    )


def sample_screened_radius(tab: ScreenedRadialTable, R, sigma_bar, u1, u2):
    """Sample the screened Green's-weighted radius in a ball of radius R.

    Replaces ``ScreenedGreensDistribution2D`` (``solvers/utils.py:154-195``)
    with exact inverse-CDF interpolation. ``u1`` picks the quantile; for
    ``z`` below the table range the closed-form unscreened sample
    ``R sqrt(u1 u2)`` is used (screened → unscreened as ``z → 0``).
    """
    z = R * jnp.sqrt(sigma_bar)
    lz = jnp.log(jnp.maximum(z, 1e-30))
    f = (lz - tab.log_z0) / tab.dlog_z
    # clamp the *integer* cell index (clamping the float value to
    # n_z - 1 - eps rounds back up to n_z - 1 in float32 and the bilinear
    # gather then reads out of bounds, which jnp.take fills with NaN)
    iz = jnp.clip(jnp.floor(f).astype(jnp.int32), 0, tab.n_z - 2)
    fz = jnp.clip(f - iz, 0.0, 1.0)
    g = u1 * (tab.n_u - 1)
    iu = jnp.clip(jnp.floor(g).astype(jnp.int32), 0, tab.n_u - 2)
    fu = jnp.clip(g - iu, 0.0, 1.0)
    flat = tab.table.reshape(-1)
    base = iz * tab.n_u + iu
    s00 = jnp.take(flat, base)
    s01 = jnp.take(flat, base + 1)
    s10 = jnp.take(flat, base + tab.n_u)
    s11 = jnp.take(flat, base + tab.n_u + 1)
    s = (1 - fz) * ((1 - fu) * s00 + fu * s01) + fz * ((1 - fu) * s10 + fu * s11)
    below = z < jnp.exp(tab.log_z0)
    s_unscreened = jnp.sqrt(u1 * u2)
    # above-range fallback: for large z the density is self-similar in
    # u = z * s (x K0(x) with an exp(-(2z - ...)) image term below float
    # resolution), so the z_max row rescaled by z_max/z samples the true
    # density to ~exp(-z_max) accuracy — without this, z past the table
    # reused the z_max radii VERBATIM (systematically ~z/z_max too large)
    z_top = jnp.exp(tab.log_z0 + (tab.n_z - 1) * tab.dlog_z)
    s = jnp.where(z > z_top, s * z_top / jnp.maximum(z, 1e-30), s)
    return R * jnp.where(below, s_unscreened, s)


def _exact_rejection(draw, R, sigma_bar, max_rounds: int,
                     with_weight: bool = False):
    """Core two-regime rejection loop; ``draw(round) -> (4, W) uniforms``.

    See :func:`sample_screened_radius_exact` for the math.

    ``with_weight``: return ``(r, w)`` where ``w`` is an exact importance
    weight making a FINITE round cap unbiased. Rounds ``0..max_rounds-2``
    are ordinary rejection (``w = 1`` on acceptance); a lane still
    unaccepted entering round ``max_rounds-1`` takes that round's envelope
    candidate UNCONDITIONALLY with ``w = A(x) / a(z)``, where ``A`` is the
    acceptance probability and ``a(z) = E_env[A]`` the closed-form
    acceptance rate. Since the target density is ``p_env A / a`` (the
    Wronskian identity ``int_0^z x (K0 - c I0) dx = 1 - 1/I0(z)`` gives
    ``a`` in both regimes: ``4 (1 - 1/I0(z)) / z^2`` small-z,
    ``1 - 1/I0(z)`` large-z), ``E_env[w f(x)] = E_target[f]`` exactly —
    the old behavior (keep the candidate at weight 1) distorted the
    distribution toward the envelope instead.
    """
    R = jnp.asarray(R, jnp.float32)
    sb = jnp.asarray(sigma_bar, jnp.float32)
    sq = jnp.sqrt(sb)
    z = jnp.maximum(R * sq, 1e-12)
    small = z < 2.0

    from ..ops.bessel import i0e, k0e

    k0e_z = k0e(z)
    i0e_z = i0e(z)

    def accept_prob(x, s):
        ratio = (k0e_z * i0e(x)) / (i0e_z * k0e(x)) * jnp.exp(
            -2.0 * jnp.maximum(z - x, 0.0)
        )
        k0x = k0e(x) * jnp.exp(-x)
        num = k0x * (1.0 - ratio)
        ln_s = -jnp.log(jnp.clip(s, 1e-12, 1.0 - 1e-7))
        p_small = jnp.clip(num / jnp.maximum(ln_s, 1e-12), 0.0, 1.0)
        p_large = jnp.where(x <= z, jnp.clip(1.0 - ratio, 0.0, 1.0), 0.0)
        return jnp.where(small, p_small, p_large)

    if with_weight:
        # closed-form acceptance rate a(z) = E_env[accept_prob], reusing
        # the i0e(z) already computed for the acceptance test
        from ..ops.greens import _one_minus_inv_i0_scaled

        p_ii = _one_minus_inv_i0_scaled(z, i0e_z)
        a_rate = jnp.maximum(
            jnp.where(small, 4.0 * p_ii / (z * z), p_ii), 1e-12
        )

    def candidates(u):
        u0 = jnp.maximum(u[0], 1e-7)
        u1 = jnp.maximum(u[1], 1e-7)
        u2 = jnp.maximum(u[2], 1e-7)
        s_small = jnp.sqrt(u0 * u1)
        x_small = z * s_small
        x_large = -jnp.log(u1 * u2) * jnp.sqrt(
            jnp.maximum(1.0 - u0 * u0, 1e-12)
        )
        x = jnp.where(small, x_small, x_large)
        s = jnp.where(small, s_small, x_large / z)
        return x, s, u[3]

    x0, s0, ua0 = candidates(draw(jnp.int32(0)))
    A0 = accept_prob(x0, s0)
    if with_weight and max_rounds == 1:
        acc0 = jnp.ones_like(s0) > 0.0  # pure IS: take round-0 candidate
        w0 = A0 / a_rate
    else:
        acc0 = ua0 < A0
        w0 = jnp.ones_like(s0)

    # the accepted mask rides the loop carry as int32: this function also
    # runs inside the Pallas kernel, where Mosaic cannot round-trip i1
    # vectors through loop carries
    def cond(carry):
        i, s_cur, w_cur, acc_i = carry
        return (i < max_rounds) & jnp.any(acc_i == 0)

    def body(carry):
        i, s_cur, w_cur, acc_i = carry
        accepted = acc_i != 0
        x, s, ua = candidates(draw(i + 1))
        A = accept_prob(x, s)
        if with_weight:
            is_final = i >= max_rounds - 1
            take = (~accepted) & ((ua < A) | is_final)
            w_new = jnp.where(is_final, A / a_rate, 1.0)
        else:
            take = (~accepted) & (ua < A)
            w_new = 1.0
        s_cur = jnp.where(take, s, s_cur)
        w_cur = jnp.where(take, w_new, w_cur)
        return i + 1, s_cur, w_cur, (accepted | take).astype(jnp.int32)

    _, s_fin, w_fin, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(1), s0, w0, acc0.astype(jnp.int32))
    )
    # z below any meaningful screening: unscreened closed form
    tiny = z < 1e-3
    u = draw(jnp.int32(-997))
    s_fin = jnp.where(
        tiny,
        jnp.sqrt(jnp.maximum(u[0], 1e-12) * jnp.maximum(u[1], 1e-12)),
        s_fin,
    )
    r_fin = jnp.clip(s_fin, 0.0, 1.0) * R
    if not with_weight:
        return r_fin
    w_fin = jnp.where(tiny, 1.0, w_fin)
    return r_fin, w_fin


def sample_screened_radius_fast(seed, counter, R, sigma_bar,
                                max_rounds: int = 64):
    """Exact screened-radius sampling with the counter-hash RNG
    (:mod:`.rng`) — identical math to :func:`sample_screened_radius_exact`
    but compiles in seconds instead of minutes inside while-loops.

    Args:
        seed: u32 scalar. counter: u32 scalar (e.g. walk-loop step index).
    """
    from .rng import counter_uniform, mix32

    lanes = int(np.prod(jnp.shape(R))) if jnp.shape(R) else 1
    base = mix32(jnp.asarray(seed).astype(jnp.uint32)
                 ^ (jnp.asarray(counter).astype(jnp.uint32)
                    * jnp.uint32(0xB5297A4D)))

    def draw(round_idx):
        u = counter_uniform(base ^ jnp.asarray(round_idx).astype(jnp.uint32)
                            * jnp.uint32(0x68E31DA4), 0, 4, lanes)
        return u.reshape((4,) + jnp.shape(R))

    return _exact_rejection(draw, R, sigma_bar, max_rounds)


def sample_screened_radius_exact(key, R, sigma_bar, max_rounds: int = 64):
    """Exact, gather-free sampling of the screened Green's-weighted radius.

    TPU-friendly replacement for the table sampler: per-lane dynamic table
    gathers serialize badly on TPU (and are unavailable inside Pallas
    kernels), so this draws *exactly* from ``p(x) ∝ x [K0(x) - c I0(x)]``
    on ``(0, z)`` (``x = r sqrt(sigma_bar)``, ``z = R sqrt(sigma_bar)``,
    ``c = K0(z)/I0(z)``) via two-regime rejection with vectorized redraws:

    * **small z (< 2)**: envelope ``-s ln s`` (the unscreened Green's radial
      density, sampled in closed form as ``s = sqrt(U1 U2)``). The ratio
      ``[K0(zs) - c I0(zs)] / (-ln s) <= 1`` for every ``z`` (screening
      only attenuates the kernel; verified numerically to 1e-8), so the
      acceptance probability needs no safety factor. Acceptance rate
      ``4 (1 - 1/I0(z)) / z^2`` -> 1 as z -> 0.

    * **large z (>= 2)**: the free-space density ``x K0(x)`` has the exact
      mixture representation ``K0(x) = int_0^inf exp(-x cosh t) dt`` with
      logistic mixing ``sech^2 t``, giving the closed-form sample
      ``x = -ln(U2 U3) * sqrt(1 - U1^2)``; candidates beyond the ball
      (``x > z``) are rejected and the reflection term is absorbed by
      accepting with probability ``1 - c I0(x)/K0(x)`` (in ``[0, 1]`` for
      ``x <= z``). Acceptance rate ``1 - 1/I0(z)`` -> 1 as z -> inf.

    Worst-case acceptance ~0.56 at the crossover, so redraw rounds are
    geometric with mean < 2; lanes redraw in lock-step inside a bounded
    while-loop (un-accepted lanes keep their final candidate if
    ``max_rounds`` is exhausted — probability < 0.44^64).

    Args:
        key: scalar PRNG key (unique per solver step).
        R: ``(W,)`` ball radii. sigma_bar: scalar screening majorant.
    Returns:
        ``(W,)`` radii in ``(0, R)``.
    """
    def draw(round_idx):
        return jax.random.uniform(
            jax.random.fold_in(key, round_idx), (4,) + jnp.shape(R),
            minval=1e-7, maxval=1.0,
        )

    return _exact_rejection(draw, R, sigma_bar, max_rounds)


def screened_radial_pdf(r, R, sigma_bar):
    """Normalized screened radial density (host/numpy oracle for tests)."""
    from scipy.special import i0, k0

    r = np.asarray(r, np.float64)
    sq = np.sqrt(sigma_bar)
    c = k0(R * sq) / i0(R * sq)
    g = k0(r * sq) - c * i0(r * sq)
    dens = np.where((r > 0) & (r < R), r * g, 0.0)
    # normalize numerically
    s = np.concatenate([
        np.geomspace(1e-7 * R, 1e-2 * R, 2048, endpoint=False),
        np.linspace(1e-2 * R, R, 8192),
    ])
    gs = k0(s * sq) - c * i0(s * sq)
    norm = np.trapezoid(s * gs, s)
    return dens / norm
