"""Statistical tests for the radial samplers against analytic densities.

The reference's samplers are validated only implicitly; here each sampler
is tested directly: empirical CDF vs analytic CDF (Kolmogorov-Smirnov-style
sup-norm bound with fixed seeds).
"""

import numpy as np
import jax
import jax.numpy as jnp

from dcrmontecarlo_tpu.sampling import (
    sample_greens_radius,
    greens_radial_pdf,
    sample_screened_radius_exact,
    sample_screened_radius_transport,
    screened_radial_pdf,
    uniform_radial,
    RadialDistribution,
    mis_sample,
)


def _ecdf_sup_error(samples, cdf_grid_r, cdf_grid_f):
    samples = np.sort(np.asarray(samples))
    emp = np.searchsorted(samples, cdf_grid_r, side="right") / len(samples)
    return np.abs(emp - cdf_grid_f).max()


def test_greens_radius_exact_distribution():
    n = 200_000
    key = jax.random.PRNGKey(0)
    u = jax.random.uniform(key, (2, n))
    R = 1.7
    r = np.asarray(sample_greens_radius(R, u[0], u[1]))
    assert (r > 0).all() and (r < R).all()
    s_grid = np.linspace(1e-4, 1.0, 200)
    cdf = s_grid**2 * (1.0 - 2.0 * np.log(s_grid))
    err = _ecdf_sup_error(r, s_grid * R, cdf)
    # KS 99.9% bound ~ 1.95/sqrt(n) ≈ 0.0044
    assert err < 0.005, err


def test_greens_radial_pdf_normalized():
    R = 2.3
    r = np.linspace(1e-6, R, 100_000)
    p = np.asarray(greens_radial_pdf(jnp.asarray(r), R))
    np.testing.assert_allclose(np.trapezoid(p, r), 1.0, rtol=1e-3)


def _weighted_ecdf_sup_error(r, w, rr, cdf):
    order = np.argsort(r)
    w_cum = np.concatenate([[0.0], np.cumsum(w[order])]) / w.sum()
    emp = w_cum[np.searchsorted(r[order], rr, side="right")]
    return np.abs(emp - cdf).max()


def _transport_draw(key, n):
    def draw(round_idx):
        return jax.random.uniform(
            jax.random.fold_in(key, round_idx), (4, n),
            minval=1e-7, maxval=1.0,
        )
    return draw


def test_transport_sampler_matches_analytic_cdf():
    # the loop-free map+IS sampler across every regime: clamp-below-range
    # (z = 0.01), unscreened-ish (0.3), mid map (2, 7), the map/free seam
    # (11.4 / 11.6), and deep screening (z = 350, the notebook regime).
    n = 400_000
    for i, (R, sb) in enumerate([(1.0, 1e-4), (0.5, 0.36), (2.0, 1.0),
                                 (10.0, 0.49), (11.4, 1.0), (11.6, 1.0),
                                 (500.0, 0.49)]):
        key = jax.random.PRNGKey(100 + i)
        r, w = sample_screened_radius_transport(
            _transport_draw(key, n), jnp.full((n,), R, jnp.float32), sb)
        r = np.asarray(r)
        w = np.asarray(w)
        assert np.isfinite(r).all() and np.isfinite(w).all()
        assert (r >= 0).all() and (r <= R + 1e-4 * R).all()
        assert (w >= 0).all()
        # exact IS: E[w] = 1 (MC error ~ std/sqrt(n) ~ tiny: the weight
        # spread is <= ~3e-5 by construction, so this is a TIGHT gate)
        np.testing.assert_allclose(w.mean(), 1.0, atol=2e-3)
        rr = np.concatenate([
            np.geomspace(1e-6 * R, 1e-2 * R, 512, endpoint=False),
            np.linspace(1e-2 * R, R, 4096),
        ])
        pdf = screened_radial_pdf(rr, R, sb)
        cdf = np.concatenate(
            [[0], np.cumsum(0.5 * (pdf[1:] + pdf[:-1]) * np.diff(rr))])
        cdf /= cdf[-1]
        err = _weighted_ecdf_sup_error(r, w, rr, cdf)
        # KS 99.9% ~ 1.95/sqrt(n) ~ 0.0031 (weights ~1 barely widen it)
        assert err < 0.005, (R, sb, err)


def test_transport_sampler_weight_spread_is_tiny():
    # the per-draw importance weight must be ~1 (it compounds over
    # ~1000-step walks): verified E[(w-1)^2] <= 1e-4 at the worst z
    # (the map/free seam) and <= 2e-5 at a typical mid-map z
    n = 400_000
    for R, sb, bound in [(11.5, 1.0, 1e-4), (3.0, 1.0, 2e-5),
                         (0.5, 1.0, 2e-5)]:
        key = jax.random.PRNGKey(7)
        _, w = sample_screened_radius_transport(
            _transport_draw(key, n), jnp.full((n,), R, jnp.float32), sb)
        w = np.asarray(w)
        m2 = np.mean((w - 1.0) ** 2)
        assert m2 < bound, (R, sb, m2)


def test_transport_sampler_mixed_lanes():
    # per-lane radii spanning clamp, map, and free regimes in one call
    n = 100_000
    key = jax.random.PRNGKey(42)
    R = jnp.asarray(np.random.default_rng(0).uniform(0.05, 80.0, n),
                    jnp.float32)
    r, w = sample_screened_radius_transport(_transport_draw(key, n), R, 0.44)
    r, w = np.asarray(r), np.asarray(w)
    assert np.isfinite(r).all() and np.isfinite(w).all()
    assert (r >= 0).all() and (r <= np.asarray(R) * (1 + 1e-5)).all()
    np.testing.assert_allclose(w.mean(), 1.0, atol=3e-3)


def test_screened_radius_exact_matches_analytic_cdf():
    # the gather-free rejection sampler (solver default) across regimes:
    # small-z envelope, crossover, deep screening, mixed per-lane radii
    n = 200_000
    for i, (R, sb) in enumerate([(1.0, 4.0), (10.0, 1.0), (0.5, 0.1),
                                 (100.0, 0.075)]):
        key = jax.random.PRNGKey(i)
        r = np.asarray(
            sample_screened_radius_exact(key, jnp.full((n,), R), sb)
        )
        assert (r >= 0).all() and (r <= R).all()
        rr = np.concatenate([
            np.geomspace(1e-6 * R, 1e-2 * R, 512, endpoint=False),
            np.linspace(1e-2 * R, R, 4096),
        ])
        pdf = screened_radial_pdf(rr, R, sb)
        cdf = np.concatenate([[0], np.cumsum(0.5 * (pdf[1:] + pdf[:-1]) * np.diff(rr))])
        cdf /= cdf[-1]
        err = _ecdf_sup_error(r, rr, cdf)
        assert err < 0.006, (R, sb, err)


def test_screened_radius_exact_mixed_lanes():
    # per-lane radii spanning both rejection regimes in one call
    n = 100_000
    key = jax.random.PRNGKey(42)
    R = jnp.asarray(np.random.default_rng(0).uniform(0.1, 50.0, n), jnp.float32)
    r = np.asarray(sample_screened_radius_exact(key, R, 0.44))
    assert (r >= 0).all() and (r <= np.asarray(R) + 1e-5).all()
    assert np.isfinite(r).all()


def test_weighted_round_cap_is_unbiased():
    # A 2-round cap leaves ~19% of draws on their envelope candidate at the
    # crossover z ~ 2 (worst-case acceptance 0.56). With the importance-
    # weighted final round the WEIGHTED ecdf must still match the analytic
    # CDF; the unweighted candidate distribution alone must NOT (sanity
    # check that the test has power).
    from dcrmontecarlo_tpu.sampling.radial import _exact_rejection

    n = 200_000
    R, sb = 2.0, 1.0  # z = 2: crossover, worst acceptance
    key = jax.random.PRNGKey(7)

    def draw(round_idx):
        return jax.random.uniform(
            jax.random.fold_in(key, round_idx), (4, n),
            minval=1e-7, maxval=1.0,
        )

    r, w = _exact_rejection(draw, jnp.full((n,), R), sb, 2, with_weight=True)
    r = np.asarray(r)
    w = np.asarray(w)
    assert np.isfinite(w).all() and (w >= 0).all()
    # weights average 1 over the fallback lanes (and exactly 1 elsewhere)
    np.testing.assert_allclose(w.mean(), 1.0, atol=0.01)
    assert (w != 1.0).mean() > 0.05  # the cap actually fired

    rr = np.concatenate([
        np.geomspace(1e-6 * R, 1e-2 * R, 512, endpoint=False),
        np.linspace(1e-2 * R, R, 4096),
    ])
    pdf = screened_radial_pdf(rr, R, sb)
    cdf = np.concatenate(
        [[0], np.cumsum(0.5 * (pdf[1:] + pdf[:-1]) * np.diff(rr))])
    cdf /= cdf[-1]
    # weighted ECDF: sum of weights of samples <= r, over total weight
    order = np.argsort(r)
    r_sorted = r[order]
    w_cum = np.concatenate([[0.0], np.cumsum(w[order])]) / w.sum()
    emp = w_cum[np.searchsorted(r_sorted, rr, side="right")]
    err_weighted = np.abs(emp - cdf).max()
    assert err_weighted < 0.008, err_weighted
    # power check: the RAW candidate ecdf (weights ignored) is distorted
    emp_raw = np.searchsorted(r_sorted, rr, side="right") / n
    err_raw = np.abs(emp_raw - cdf).max()
    assert err_raw > 3 * err_weighted, (err_raw, err_weighted)


def test_transport_sampler_tiny_z_matches_unscreened():
    # z far below the fit range: the map clamps to Z_LO and the exact
    # weight absorbs the O(z^2) shape difference — the WEIGHTED ecdf must
    # match the unscreened law
    key = jax.random.PRNGKey(2)
    n = 200_000
    R = 1.0
    r, w = sample_screened_radius_transport(
        _transport_draw(key, n), jnp.full((n,), R, jnp.float32), 1e-8)
    r, w = np.asarray(r), np.asarray(w)
    s_grid = np.linspace(1e-4, 1.0, 200)
    cdf = s_grid**2 * (1.0 - 2.0 * np.log(s_grid))
    assert _weighted_ecdf_sup_error(r, w, s_grid * R, cdf) < 0.005


def test_mis_balance_heuristic_unbiased():
    # Estimate int_0^R f(r) dr with two distributions; MIS must be unbiased.
    R = 1.0
    greens = RadialDistribution(
        sample=lambda R, u1, u2: sample_greens_radius(R, u1, u2),
        pdf=lambda r, R: greens_radial_pdf(r, R),
    )
    dists = [uniform_radial(), greens]
    key = jax.random.PRNGKey(3)
    n = 400_000
    us, u1, u2 = jax.random.uniform(key, (3, n))
    r, idx, w = mis_sample(dists, [0.5, 0.5], R, us, u1, u2)
    # combined estimator: E[w_i f(r)/ (c_i p_i(r))] summed over techniques
    f = lambda r: r * r
    wj = jnp.asarray([0.5, 0.5])
    pdfs = jnp.stack([d.pdf(r, R) for d in dists], axis=-1)
    p_sel = jnp.take_along_axis(pdfs, idx[:, None], axis=-1)[:, 0]
    est = np.asarray(jnp.mean(w * f(r) / jnp.maximum(wj[idx] * p_sel, 1e-30)))
    np.testing.assert_allclose(est, 1.0 / 3.0, rtol=0.02)


def test_transport_coeffs_are_monotone():
    # regression on the generated constants: the fitted map must be
    # strictly increasing in v for every omega (that's what makes the
    # proposal density q = m'(v)/S'(v) — and hence the IS weight — exact);
    # re-verify here so a bad regeneration cannot ship
    from numpy.polynomial import chebyshev as C

    from dcrmontecarlo_tpu.sampling._transport_coeffs import COEFFS

    B = np.asarray(COEFFS)
    vs = np.linspace(0.0, 1.0, 8001)
    tv = 2 * vs - 1
    for w in np.linspace(-1.0, 1.0, 101):
        Tw = C.chebvander(np.array([w]), B.shape[1] - 1)[0]
        c = B @ Tw
        ds = C.chebval(tv, C.chebder(c)) * 2.0
        assert ds.min() > 0.01, (w, ds.min())


def test_screened_radius_exact_extreme_screening():
    # z = R sqrt(sigma_bar) = 350: the NOTEBOOK regime (1000 m star radii,
    # ~1.4 m screening length). The earlier cases stop at z ~ 27; at z = 350
    # every step is a collide-vs-hit race through the asymptotic Bessel
    # forms, so a distortion here is invisible to the moderate-z gates yet
    # compounds over a survey walk's thousands of near-wall steps
    # (THEORY.md §4f instrumentation round, 2026-08-18: measured E[w] = 1
    # exactly and weighted-ECDF sup error ~2e-4 at 6e6 draws).
    from dcrmontecarlo_tpu.sampling.radial import _exact_rejection

    n = 400_000
    R, sb = 500.0, 0.49  # z = 350
    key = jax.random.PRNGKey(3)

    def draw(round_idx):
        return jax.random.uniform(
            jax.random.fold_in(key, round_idx), (4, n),
            minval=1e-7, maxval=1.0,
        )

    r, w = _exact_rejection(
        draw, jnp.full((n,), R), sb, 2, with_weight=True)
    r = np.asarray(r)
    w = np.asarray(w)
    assert np.isfinite(r).all() and np.isfinite(w).all()
    assert (r >= 0).all() and (r <= R).all()
    np.testing.assert_allclose(w.mean(), 1.0, atol=0.005)

    # the density support is ~(0, 20/sqrt(sb)); resolve it there
    rr = np.concatenate([
        np.geomspace(1e-5, 0.1, 256, endpoint=False),
        np.linspace(0.1, 30.0, 4096),
        np.linspace(30.0, R, 512)[1:],
    ])
    pdf = screened_radial_pdf(rr, R, sb)
    cdf = np.concatenate(
        [[0], np.cumsum(0.5 * (pdf[1:] + pdf[:-1]) * np.diff(rr))])
    cdf /= cdf[-1]
    order = np.argsort(r)
    w_cum = np.concatenate([[0.0], np.cumsum(w[order])]) / w.sum()
    emp = w_cum[np.searchsorted(r[order], rr, side="right")]
    err = np.abs(emp - cdf).max()
    assert err < 0.006, err
