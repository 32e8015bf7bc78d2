"""Pallas fused-kernel tests.

Statistical checks require the hardware PRNG (``pltpu.prng_random_bits``
returns zeros in interpreter mode), so they run only on a real TPU —
CI covers the XLA path; the driver's TPU bench exercises this one.
Structural checks (kernel traces, deterministic semantics match the XLA
step) run everywhere via interpreter mode.
"""

import numpy as np
import jax
import pytest

from dcrmontecarlo_tpu import Problem, WoStSolver, square_loop, circle_loop
from dcrmontecarlo_tpu.solver import SolverOptions
from dcrmontecarlo_tpu.ops.pallas_walk import pallas_supported

on_tpu = jax.default_backend() == "tpu"


def test_pallas_supported_detection():
    prob = Problem(dirichlet=square_loop(1.0))
    assert pallas_supported(prob)
    # medium geometry: SMEM-table mode
    med = Problem(dirichlet=circle_loop(1.0, n=256))
    assert pallas_supported(med)
    # beyond the SMEM budget: XLA only
    from dcrmontecarlo_tpu.geometry import func_to_polyline

    huge = Problem(
        dirichlet=func_to_polyline(lambda x: 0.0 * x, 0.0, 9000.0, 1.0)
    )
    assert not pallas_supported(huge)


def test_backend_pallas_rejects_oversized_geometry():
    from dcrmontecarlo_tpu.geometry import func_to_polyline

    huge = Problem(
        dirichlet=func_to_polyline(lambda x: 0.0 * x, 0.0, 9000.0, 1.0)
    )
    s = WoStSolver(huge, SolverOptions(backend="pallas"))
    with pytest.raises(ValueError):
        s._use_pallas()


def test_pallas_dynamic_geometry_traces_in_interpret_mode():
    # >96 segments -> SMEM-table kernel path; deterministic interpret-mode
    # walk along +x from the disk center terminates at bc(1, 0) = 1
    from jax.experimental.pallas import tpu as pltpu

    prob = Problem(dirichlet=circle_loop(1.0, n=256),
                   bc_dirichlet=lambda x, y: x + 2 * y)
    s = WoStSolver(
        prob,
        SolverOptions(target_slots=256, backend="pallas",
                      pallas_inner_steps=16, pallas_block_rows=8),
    )
    with pltpu.force_tpu_interpret_mode():
        res = s.solve(np.array([[0.0, 0.0]]), n_walks=16, max_steps=30,
                      eps=1e-3, seed=0)
    np.testing.assert_allclose(res.mean, [1.0], atol=1e-4)


def test_auto_backend_on_cpu_is_xla():
    prob = Problem(dirichlet=square_loop(1.0))
    s = WoStSolver(prob, SolverOptions(backend="auto"))
    if not on_tpu:
        assert not s._use_pallas()


def test_pallas_kernel_traces_in_interpret_mode():
    # semantic smoke: kernel compiles & runs (PRNG is zeros in interpret
    # mode, so walks march deterministically along +x; the estimate is then
    # exactly bc(p0 + dD * x_hat))
    from jax.experimental.pallas import tpu as pltpu

    prob = Problem(dirichlet=square_loop(1.0), bc_dirichlet=lambda x, y: x + 2 * y)
    s = WoStSolver(
        prob,
        SolverOptions(target_slots=256, backend="pallas",
                      pallas_inner_steps=16, pallas_block_rows=8),
    )
    with pltpu.force_tpu_interpret_mode():
        res = s.solve(np.array([[0.0, 0.0], [0.5, 0.3]]), n_walks=16,
                      max_steps=50, eps=1e-3, seed=0)
    np.testing.assert_allclose(res.mean, [1.0, 1.6], atol=1e-5)
    np.testing.assert_allclose(res.stderr, 0.0, atol=1e-6)


@pytest.mark.skipif(not on_tpu, reason="hardware PRNG required")
def test_pallas_harmonic_tpu():
    prob = Problem(dirichlet=square_loop(1.0), bc_dirichlet=lambda x, y: x + 2 * y)
    s = WoStSolver(prob, SolverOptions(target_slots=1 << 15, backend="pallas"))
    pts = np.array([[0.0, 0.0], [0.5, 0.3]])
    res = s.solve(pts, n_walks=8000, max_steps=200, eps=1e-3, seed=0)
    exact = pts[:, 0] + 2 * pts[:, 1]
    assert (np.abs(res.mean - exact) < 4 * res.stderr + 5e-3).all()


@pytest.mark.skipif(not on_tpu, reason="hardware PRNG required")
def test_pallas_matches_xla_tpu():
    prob = Problem(
        dirichlet=square_loop(2.0),
        bc_dirichlet=lambda x, y: x * x + y * y,
        source=lambda x, y: -4.0 + 0.0 * x,
    )
    pts = np.array([[0.0, 0.0], [1.0, 0.5]])
    a = WoStSolver(prob, SolverOptions(target_slots=1 << 14, backend="pallas")).solve(
        pts, n_walks=8000, max_steps=300, eps=1e-3, seed=0
    )
    b = WoStSolver(prob, SolverOptions(target_slots=1 << 14, backend="xla")).solve(
        pts, n_walks=8000, max_steps=300, eps=1e-3, seed=0
    )
    err = np.abs(a.mean - b.mean)
    tol = 4 * np.sqrt(a.stderr**2 + b.stderr**2)
    assert (err < tol).all(), (a.mean, b.mean)


@pytest.mark.skipif(not on_tpu, reason="hardware PRNG required")
def test_pallas_mis_neumann_matches_fdm_tpu():
    # Regression for the on-Neumann MIS hemisphere-density bias: the
    # reference values are from the 481^2 finite-volume oracle on the
    # identical problem (see the 2026-08 bias isolation in git history).
    from dcrmontecarlo_tpu.geometry import Polyline
    from dcrmontecarlo_tpu.problems.fields import (
        GaussianMixture,
        gaussian_dipole,
    )

    w = 0.5
    A, B = (-2.5, -1.0), (2.5, -1.0)
    prob = Problem(
        dirichlet=Polyline.from_points(
            [[-30.0, 0.0], [-30.0, -60.0], [30.0, -60.0], [30.0, 0.0]]
        ),
        neumann=Polyline.from_points([[-30.0, 0.0], [30.0, 0.0]]),
        bc_dirichlet=lambda x, y: 0.0 * x,
        source=gaussian_dipole(A, B, 1.0, w),
        alpha=lambda x, y: 10.0 + 0.0 * x,
        source_importance=GaussianMixture.from_components(
            [(A, w, 0.5), (B, w, 0.5)]
        ),
    )
    pts = np.array([[7.5, -0.1], [12.5, -0.1], [-7.5, -0.1]], np.float32)
    fdm_ref = np.array([-0.02008, -0.01075, 0.02008])
    s = WoStSolver(prob, SolverOptions(target_slots=1 << 15, backend="pallas"))
    r = s.solve(pts, n_walks=40000, max_steps=2000, eps=0.05, seed=0)
    dev = np.abs(r.mean - fdm_ref) / np.maximum(r.stderr, 1e-12)
    assert (dev < 4.0).all(), (r.mean, fdm_ref, r.stderr)


def test_smem_tables_padded_to_chunk_multiple():
    # Regression: the SMEM chunk loops run rows // _CHUNK iterations, so a
    # table only padded to Polyline's multiple of 8 silently dropped up to
    # 24 trailing real segments (e.g. 100 segs -> 104 rows -> 96 seen).
    from dcrmontecarlo_tpu.ops.pallas_walk import _CHUNK, _seg_table, _vert_table

    poly = circle_loop(1.0, n=100)
    assert _seg_table(poly).shape[0] % _CHUNK == 0
    prob = Problem(dirichlet=square_loop(30.0),
                   neumann=circle_loop(1.0, n=100))
    assert _vert_table(prob.neumann).shape[0] % _CHUNK == 0


def _subdivided_square_right_edge_last():
    # 100-segment unit square with the segment containing (1, 0) at table
    # index 98 — inside the trailing block the pre-fix SMEM loop dropped.
    pts = []

    def edge(a, b, n, include_start):
        for k in range(0 if include_start else 1, n + 1):
            t = k / n
            pts.append([a[0] + t * (b[0] - a[0]), a[1] + t * (b[1] - a[1])])

    edge((1, 1), (-1, 1), 32, True)    # top:    segs 0-31
    edge((-1, 1), (-1, -1), 32, False)  # left:   segs 32-63
    edge((-1, -1), (1, -1), 33, False)  # bottom: segs 64-96
    edge((1, -1), (1, 1), 3, False)     # right:  segs 97-99; (1,0) in seg 98
    from dcrmontecarlo_tpu.geometry import Polyline

    return Polyline.from_points(pts)


def test_pallas_smem_sees_trailing_segments():
    # Deterministic interpret-mode walk (PRNG zeros -> march along +x) from
    # the center: must terminate on the right edge at (1, 0) with bc = 1.
    # Pre-fix, the right edge was invisible to the SMEM kernel, so the
    # walker escaped the domain and accumulated bc far outside.
    from jax.experimental.pallas import tpu as pltpu

    poly = _subdivided_square_right_edge_last()
    assert poly.num_segments == 100
    prob = Problem(dirichlet=poly, bc_dirichlet=lambda x, y: x + 2 * y)
    s = WoStSolver(
        prob,
        SolverOptions(target_slots=256, backend="pallas",
                      pallas_inner_steps=16, pallas_block_rows=8),
    )
    with pltpu.force_tpu_interpret_mode():
        res = s.solve(np.array([[0.0, 0.0]]), n_walks=16, max_steps=30,
                      eps=1e-3, seed=0)
    np.testing.assert_allclose(res.mean, [1.0], atol=1e-4)
