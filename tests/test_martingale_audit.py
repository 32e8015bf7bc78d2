"""Self-validating tests of the per-step martingale auditor.

Two directions, so the instrument itself is gated:

* a known-unbiased operator (robin chain, strongly-screened MMS) shows
  ~zero mean increment in the interior buckets (negative control);
* a known-BIASED operator (``robin_correction=False`` on the same
  problem: plain reflection drops the transform's Robin mass) shows a
  large, significant on-boundary deficit (positive control — the audit
  must DETECT a real leak, not just bless everything).

Methodology: THEORY.md §4f/§4g. The reference has no estimator-level
audit at all (RMSE eyeballing only, testWoStCorrectness.py:187-196).
"""
import numpy as np
import pytest

import jax.numpy as jnp

from dcrmontecarlo_tpu.geometry import Polyline
from dcrmontecarlo_tpu.models import autodiff_manufactured
from dcrmontecarlo_tpu.solver import SolverOptions
from dcrmontecarlo_tpu.diagnostics import martingale_audit, grid_continuation


L, C0 = 10.0, 2.0
W_TANH = 0.6 * L


def _mms():
    def um(x, y):
        return (100.0 * jnp.sin(jnp.pi * (x + L / 2) / L)
                * jnp.cos(jnp.pi * y / (2 * L)))

    def alpham(x, y):
        return jnp.exp(-C0 * jnp.tanh(-y / W_TANH)) + 0.0 * x

    prob, _ = autodiff_manufactured(
        um, alpha=alpham,
        dirichlet=Polyline.from_points(
            [[-L / 2, 0.0], [-L / 2, -L], [L / 2, -L], [L / 2, 0.0]]),
        neumann=Polyline.from_points([[-L / 2, 0.0], [L / 2, 0.0]]))
    return prob, um


def _audit(robin, n_seeds=4, n_walkers=1 << 15, n_steps=24):
    prob, um = _mms()
    opts = SolverOptions(backend="xla", target_slots=n_walkers,
                         robin_correction=robin, rejection_rounds=2,
                         boundary_snap=0.01)
    return martingale_audit(
        prob, opts, (0.0, 0.0), continuation=um, eps=0.02,
        on_boundary=True, normal=(0.0, -1.0),
        n_steps=n_steps, n_walkers=n_walkers, n_seeds=n_seeds)


def test_audit_blesses_unbiased_interior_and_detects_offmode_deficit():
    rep_chain = _audit("chain")
    # negative control: interior buckets of the unbiased chain operator
    # (u-scale is 100, so 5 sigma + a 0.05 absolute floor ~ 0.05% slack)
    for b in (0, 1):
        assert abs(rep_chain.mean[b]) < 5 * rep_chain.sem[b] + 0.05, (
            rep_chain.bucket_names[b], rep_chain.mean[b], rep_chain.sem[b])
    # the designed eps-shell completion bias is isolated in its bucket
    # (nonzero, small, negative for this interior-positive MMS)
    assert -1.0 < rep_chain.mean[4] < 0.0

    # positive control: off mode leaks the whole Robin mass from the
    # on-boundary buckets (measured ~-41 per pristine visit at 16x power)
    rep_off = _audit(False)
    assert rep_off.mean[3] < -20.0
    assert rep_off.mean[3] < -5 * rep_off.sem[3]
    # and its far-interior operator is still clean (the leak localizes)
    assert abs(rep_off.mean[0]) < 5 * rep_off.sem[0] + 0.05


def test_grid_continuation_matches_bilinear():
    xs = np.linspace(-1.0, 1.0, 21)
    ys = np.linspace(-2.0, 0.0, 11)
    U = np.add.outer(xs**2, 3.0 * ys)
    cont = grid_continuation(xs, ys, U)
    pts = np.array([[-0.63, -1.17], [0.5, -0.05], [0.98, -1.99]], np.float32)
    got = np.asarray(cont(jnp.asarray(pts[:, 0]), jnp.asarray(pts[:, 1])))
    # bilinear interp of a bilinear-exact field in y and quadratic in x:
    # compare against the same-formula numpy reference
    from dcrmontecarlo_tpu.validation.fdm import FDMSolution
    ref = FDMSolution(xs, ys, U)(pts)
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


def test_notebook_step_operator_normalized_residuals():
    # Tripwire over the FULL production step stack at notebook conditions
    # (extreme screening z~350, MIS NEE, chain Robin, air sigmoid): the
    # atten-NORMALIZED per-visit residuals against the FDM-oracle
    # continuation must stay ~0 in every bucket. Calibration (THEORY.md
    # §4f, 2026-08-18): off-mode reads +15 per 48 steps and reflectance
    # +0.40 at this observable, so a tolerance of 0.1/visit catches any
    # leak 1/30th the size of plain reflection's.
    import jax
    from dcrmontecarlo_tpu.models import notebook_survey
    from dcrmontecarlo_tpu.validation import fdm_solve

    survey, _ = notebook_survey()
    survey.source_mis = True
    prob = survey.build_problem()
    alpha_v = jax.vmap(lambda x, y: prob.alpha(x, y))
    src_v = jax.vmap(lambda x, y: prob.source(x, y))

    def alpha_np(X, Y):
        return np.asarray(alpha_v(X.ravel().astype(np.float32),
                                  Y.ravel().astype(np.float32))
                          ).reshape(X.shape)

    def source_np(X, Y):
        return np.asarray(src_v(X.ravel().astype(np.float32),
                                Y.ravel().astype(np.float32))
                          ).reshape(X.shape)

    fdm = fdm_solve(bounds=((-500.0, 500.0), (-1000.0, 1.0)),
                    alpha=alpha_np, source=source_np,
                    neumann_top=True, nx=201, ny=201)
    cont = grid_continuation(fdm.xs, fdm.ys, fdm.u)
    opts = SolverOptions(backend="xla", target_slots=1 << 15,
                         robin_correction="chain", rejection_rounds=2)
    rep = martingale_audit(
        prob, opts, (0.0, -0.1), continuation=cont, eps=1.0,
        max_steps=6000, n_steps=24, n_walkers=1 << 15, n_seeds=4,
        normalize_by_atten=True)
    # far-interior doubles as the oracle-quality control (tight)
    assert abs(rep.mean[0]) < 5 * rep.sem[0] + 0.03, (
        rep.mean[0], rep.sem[0])
    for b in (1, 2):  # near-wall, on-boundary
        if rep.n[b] == 0:
            continue
        assert abs(rep.mean[b]) < 5 * rep.sem[b] + 0.1, (
            rep.bucket_names[b], rep.mean[b], rep.sem[b])


def test_banded_audit_partitions_the_unbanded_buckets():
    # atten_bands x step_bands (round-5 §4f instrument): the banded grid
    # must be a PARTITION of each state bucket — visit counts and raw
    # increment sums re-aggregate exactly to the unbanded audit (same
    # seeds, same walks), and the names carry the band labels.
    prob, um = _mms()
    opts = SolverOptions(backend="xla", target_slots=1 << 12,
                         robin_correction="chain", rejection_rounds=2,
                         boundary_snap=0.01)
    kw = dict(problem=prob, options=opts, point=(0.0, 0.0),
              continuation=um, eps=0.02, on_boundary=True,
              normal=(0.0, -1.0), n_steps=12, n_walkers=1 << 12,
              n_seeds=2)
    plain = martingale_audit(**kw)
    banded = martingale_audit(**kw, atten_bands=[0.9, 1.1],
                              step_bands=[4])
    assert len(banded.bucket_names) == 5 * 3 * 2
    assert "far-interior@a<0.9@t<4" in banded.bucket_names
    assert "on-boundary@a>=1.1@t>=4" in banded.bucket_names
    n_b = np.asarray(banded.n).reshape(5, 3, 2)
    np.testing.assert_allclose(n_b.sum(axis=(1, 2)), plain.n)
    sums_b = (np.asarray(banded.mean) * np.asarray(banded.n)).reshape(
        5, 3, 2).sum(axis=(1, 2))
    np.testing.assert_allclose(
        sums_b, np.asarray(plain.mean) * np.asarray(plain.n),
        rtol=1e-5, atol=1e-5)
