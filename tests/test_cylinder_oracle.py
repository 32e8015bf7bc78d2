"""The author-independent analytic gate (round-5 verdict item 4).

The repo's FDM/FEM oracles share every modelling convention (same
author, same smoothed fields, same regularized sources), so a shared
blind spot would pass both. This file gates against textbook math that
shares NOTHING with either grid code: the Rayleigh multipole / image
series for a line-current dipole over a buried cylinder under an
insulating surface (``validation/cylinder.py``), at the notebook's
contrasts and scale. Three tiers:

1. the series SELF-CERTIFIES: it satisfies the PDE, both interface
   conditions, and the surface Neumann condition — by uniqueness those
   residuals, not trust in the derivation, make it an oracle;
2. ``validation/fdm.py`` (run live, sharp discontinuous cylinder) must
   converge to the series — the grid code validated against someone
   else's math;
3. the MC solver (smoothed sigmoid field it actually runs, production
   survey defaults + splitting) must match series + smoothing-delta
   within its statistical gate.

Reference parity: the oracle role of SimPEG FEM in
``/root/reference/tests/testNotebook.ipynb`` cells 5-15.
"""
import numpy as np
import pytest

from dcrmontecarlo_tpu.validation.cylinder import (
    CylinderHalfspace,
    regularize_sources,
)

# geometry mirrors tools/gen_cylinder_pins.py (kept in lockstep by the
# slow regeneration test below)
CENTER = (-120.0, -80.0)
RADIUS = 60.0
SIGMA0 = 1e-2
SURFACE_Y = 1.0
SOURCES = [((-200.0, -9.0), 1.0), ((200.0, -9.0), -1.0)]
WIDTH = 5.0
SHARPNESS = 0.1
DOMAIN = ((-500.0, 500.0), (-1000.0, SURFACE_Y))


def _pins():
    from dcrmontecarlo_tpu.validation import cylinder_oracle_pins

    return cylinder_oracle_pins()


def _electrodes():
    return np.stack([np.arange(-400.0, 401.0, 40.0), np.full(21, -0.1)], 1)


# --------------------------------------------------------------------- #
# tier 1: self-certification                                            #
# --------------------------------------------------------------------- #
@pytest.mark.parametrize("sigma1", [1e-1, 1e-3])
def test_series_self_certifies(sigma1):
    sol = CylinderHalfspace(CENTER, RADIUS, SIGMA0, sigma1, SURFACE_Y,
                            SOURCES)
    ru, rf = sol.interface_residuals()
    assert ru < 1e-4   # |u jump| relative, probe-error-limited
    # flux probe is one-sided O(h) with extrapolation; the resistor
    # contrast (tiny interior flux) normalizes to ~3e-4 — still a 0.1%
    # certification of sigma du/dn continuity
    assert rf < 1e-3
    xs = np.linspace(-450.0, 450.0, 41)
    assert sol.surface_flux(xs).max() < 1e-3  # du/dy ~ 0 on the surface
    probes = np.array([[50.0, -300.0], [-300.0, -500.0],
                       [-120.0, -80.0], [200.0, -40.0]])
    assert sol.laplacian_residual(probes).max() < 1e-6  # harmonic


def test_series_pins_match():
    # the committed pins are exactly what the series produces today
    pins = _pins()
    el = _electrodes()
    np.testing.assert_allclose(pins["electrodes"], el, atol=1e-9)
    for name, s1 in (("conductor", 1e-1), ("resistor", 1e-3)):
        u_reg = regularize_sources(
            lambda s, s1=s1: CylinderHalfspace(
                CENTER, RADIUS, SIGMA0, s1, SURFACE_Y, s),
            SOURCES, WIDTH, SURFACE_Y)
        np.testing.assert_allclose(u_reg(el), pins[f"ref_{name}"],
                                   rtol=0, atol=1e-6)


# --------------------------------------------------------------------- #
# tier 2: the FDM oracle vs the independent math (sharp cylinder)       #
# --------------------------------------------------------------------- #
@pytest.mark.parametrize("name,sigma1", [("conductor", 1e-1),
                                         ("resistor", 1e-3)])
def test_fdm_matches_cylinder_series(name, sigma1):
    from dcrmontecarlo_tpu.validation.fdm import fdm_solve

    pins = _pins()
    el = _electrodes()
    ref = pins[f"ref_{name}"]
    u_reg = regularize_sources(
        lambda s: CylinderHalfspace(CENTER, RADIUS, SIGMA0, sigma1,
                                    SURFACE_Y, s),
        SOURCES, WIDTH, SURFACE_Y)

    def alpha_sharp(X, Y):
        return np.where(
            (X - CENTER[0]) ** 2 + (Y - CENTER[1]) ** 2 < RADIUS ** 2,
            sigma1, SIGMA0)

    def source_np(X, Y):
        n = 1.0 / (2 * np.pi * WIDTH * WIDTH)
        out = 0.0
        for (sx, sy), cur in SOURCES:
            out = out + cur * n * np.exp(
                -((X - sx) ** 2 + (Y - sy) ** 2) / (2 * WIDTH * WIDTH))
        return out

    def bc_np(X, Y):
        o = np.zeros_like(X)
        m = ((np.abs(X - DOMAIN[0][0]) < 1e-9)
             | (np.abs(X - DOMAIN[0][1]) < 1e-9)
             | (np.abs(Y - DOMAIN[1][0]) < 1e-9))
        o[m] = u_reg(np.stack([X[m], Y[m]], 1))
        return o

    errs = {}
    for n in (201, 401):
        f = fdm_solve(DOMAIN, alpha_sharp, source_np, neumann_top=True,
                      bc=bc_np, nx=n, ny=n)
        errs[n] = np.abs(f(el) - ref).max()
    # measured (2026-08-20): conductor 0.52 -> 0.14; the discontinuous-
    # coefficient harmonic-face stencil converges ~O(h^1.9) here
    assert errs[401] < 0.3, errs
    assert errs[401] < 0.6 * errs[201], errs  # genuinely converging
    # the pinned 401 values match the live solve (fdm.py drift tripwire)
    np.testing.assert_allclose(errs[401], np.abs(
        pins[f"fdm_sharp_401_{name}"] - ref).max(), atol=5e-3)


# --------------------------------------------------------------------- #
# tier 3: the MC solver vs the independent math                         #
# --------------------------------------------------------------------- #
def test_mc_matches_cylinder_series():
    import jax.numpy as jnp  # noqa: F401  (fields are jnp expressions)

    from dcrmontecarlo_tpu.diagnostics import grid_continuation
    from dcrmontecarlo_tpu.problems import Problem
    from dcrmontecarlo_tpu.problems.fields import (
        GaussianMixture,
        gaussian_dipole,
        smooth_circle,
    )
    from dcrmontecarlo_tpu.solver import WoStSolver
    from dcrmontecarlo_tpu.survey.dcr import (
        halfspace_domain,
        survey_default_options,
    )

    pins = _pins()
    el = _electrodes()
    # oracle for the field MC actually runs: sharp series + the pinned
    # FDM smoothing delta (same-grid difference; discretization cancels)
    ref = pins["ref_conductor"] + pins["delta_smooth_conductor"]
    bc = grid_continuation(pins["gx"], pins["gy"],
                           pins["bc_grid_conductor"])
    bump = smooth_circle(CENTER, RADIUS, SHARPNESS)
    dirichlet, neumann = halfspace_domain(500.0, 1001.0, SURFACE_Y)
    prob = Problem(
        dirichlet=dirichlet,
        neumann=neumann,
        bc_dirichlet=bc,
        source=gaussian_dipole(SOURCES[0][0], SOURCES[1][0], 1.0, WIDTH),
        alpha=lambda x, y: SIGMA0 + (1e-1 - SIGMA0) * bump(x, y),
        source_importance=GaussianMixture.from_components(
            [(SOURCES[0][0], WIDTH, 0.5), (SOURCES[1][0], WIDTH, 0.5)]),
        local_majorant="auto",
    )
    # production survey defaults + unbiased splitting (the nonzero
    # Dirichlet values expose heavy-|atten| walks to bc banking, so the
    # tail needs the split; measured calibration 2026-08-20, 6 seeds:
    # >= 18/21 electrodes within 4 sigma + 2.0, max dev 1.61 on that
    # basis -> gate at 4 sigma + 3.0, >= 18/21. Common-mode tripwire
    # matches the flagship convention (chain §4f offset is ~-9 here,
    # measured 8 seeds: -8.7 +- 0.65).
    solver = WoStSolver(prob, survey_default_options(
        target_slots=16384, split_threshold=4.0))
    for seed in (0, 1, 2):
        r = solver.solve(el, n_walks=2500, max_steps=6000, eps=1.0,
                         seed=seed)
        err = r.mean - ref
        dev = np.abs(err) / (4.0 * r.stderr + 3.0)
        assert (dev < 1.0).sum() >= 18, (seed, err, dev)
        cm = np.median(err)
        assert -30.0 < cm < 6.0, (seed, cm, err)
        # physics sign pattern: positive pole positive, negative negative
        # (stderr-weighted: single-electrode heavy-tail excursions carry
        # proportionally huge stderr and must not flip the check)
        x = el[:, 0]
        w = 1.0 / np.maximum(r.stderr, 1e-9) ** 2
        for sel, sign in ((np.abs(x + 200) <= 40, 1.0),
                          (np.abs(x - 200) <= 40, -1.0)):
            wm = np.sum(w[sel] * r.mean[sel]) / np.sum(w[sel])
            assert sign * wm > 0, (seed, r.mean[sel], r.stderr[sel])


# --------------------------------------------------------------------- #
# slow: full pin regeneration (oracle/model drift tripwire)             #
# --------------------------------------------------------------------- #
@pytest.mark.slow
def test_cylinder_pins_regenerate():
    import importlib

    gen = importlib.import_module("tools.gen_cylinder_pins")
    pins = _pins()
    # regenerate the smoothing delta live and compare (the heavyweight
    # part; the series part is covered by test_series_pins_match)
    from dcrmontecarlo_tpu.validation.fdm import fdm_solve
    from dcrmontecarlo_tpu.problems.fields import smooth_circle

    el = _electrodes()
    s1 = 1e-1
    u_reg = regularize_sources(
        lambda s: CylinderHalfspace(CENTER, RADIUS, SIGMA0, s1, SURFACE_Y,
                                    s),
        SOURCES, WIDTH, SURFACE_Y)
    bump = smooth_circle(CENTER, RADIUS, SHARPNESS)

    def alpha_smooth(X, Y):
        import jax.numpy as jnp

        return (np.asarray(bump(jnp.asarray(X), jnp.asarray(Y)))
                * (s1 - SIGMA0) + SIGMA0)

    def alpha_sharp(X, Y):
        return np.where(
            (X - CENTER[0]) ** 2 + (Y - CENTER[1]) ** 2 < RADIUS ** 2,
            s1, SIGMA0)

    def source_np(X, Y):
        n = 1.0 / (2 * np.pi * WIDTH * WIDTH)
        out = 0.0
        for (sx, sy), cur in SOURCES:
            out = out + cur * n * np.exp(
                -((X - sx) ** 2 + (Y - sy) ** 2) / (2 * WIDTH * WIDTH))
        return out

    def bc_np(X, Y):
        o = np.zeros_like(X)
        m = ((np.abs(X - DOMAIN[0][0]) < 1e-9)
             | (np.abs(X - DOMAIN[0][1]) < 1e-9)
             | (np.abs(Y - DOMAIN[1][0]) < 1e-9))
        o[m] = u_reg(np.stack([X[m], Y[m]], 1))
        return o

    f_sm = fdm_solve(DOMAIN, alpha_smooth, source_np, neumann_top=True,
                     bc=bc_np, nx=401, ny=401)
    f_sh = fdm_solve(DOMAIN, alpha_sharp, source_np, neumann_top=True,
                     bc=bc_np, nx=401, ny=401)
    np.testing.assert_allclose(f_sm(el) - f_sh(el),
                               pins["delta_smooth_conductor"], atol=1e-6)
    assert gen.CONTRASTS == {"conductor": 1e-1, "resistor": 1e-3}
