"""Sharded solver tests on the virtual 8-device CPU mesh."""

import numpy as np
import jax

from dcrmontecarlo_tpu import Problem, square_loop
from dcrmontecarlo_tpu.parallel import ShardedWoStSolver, make_mesh
from dcrmontecarlo_tpu.solver import SolverOptions, WoStSolver


def test_eight_device_mesh_available():
    assert len(jax.devices()) >= 8


def test_sharded_matches_analytic():
    prob = Problem(
        dirichlet=square_loop(1.0),
        bc_dirichlet=lambda x, y: x + 2.0 * y,
    )
    mesh = make_mesh(8)
    solver = ShardedWoStSolver(prob, mesh, SolverOptions(target_slots=4096))
    pts = np.array([[0.0, 0.0], [0.5, 0.3], [-0.7, -0.2]])
    res = solver.solve(pts, n_walks=4000, max_steps=200, eps=1e-3, seed=0)
    exact = pts[:, 0] + 2.0 * pts[:, 1]
    err = np.abs(res.mean - exact)
    tol = 4.0 * res.stderr + 5e-3
    assert (err < tol).all(), (res.mean, exact, res.stderr)
    assert res.total_steps > 0


def test_sharded_poisson_source():
    prob = Problem(
        dirichlet=square_loop(2.0),
        bc_dirichlet=lambda x, y: x * x + y * y,
        source=lambda x, y: -4.0 + 0.0 * x,
    )
    mesh = make_mesh(8)
    solver = ShardedWoStSolver(prob, mesh, SolverOptions(target_slots=8192))
    pts = np.array([[0.0, 0.0], [1.0, 0.5]])
    res = solver.solve(pts, n_walks=4000, max_steps=300, eps=1e-3, seed=1)
    exact = pts[:, 0] ** 2 + pts[:, 1] ** 2
    err = np.abs(res.mean - exact)
    assert (err < 4.0 * res.stderr + 0.02).all(), (res.mean, exact, res.stderr)


def test_sharded_agrees_with_single_device():
    # same problem solved sharded vs single-device must agree within
    # combined MC error (different RNG streams)
    prob = Problem(
        dirichlet=square_loop(1.0),
        bc_dirichlet=lambda x, y: x * x - y * y,
    )
    pts = np.array([[0.2, 0.1], [-0.4, 0.5]])
    single = WoStSolver(prob, SolverOptions(target_slots=2048)).solve(
        pts, n_walks=4000, max_steps=200, eps=1e-3, seed=0
    )
    sharded = ShardedWoStSolver(prob, make_mesh(8), SolverOptions(target_slots=2048)).solve(
        pts, n_walks=4000, max_steps=200, eps=1e-3, seed=0
    )
    err = np.abs(single.mean - sharded.mean)
    tol = 4.0 * np.sqrt(single.stderr**2 + sharded.stderr**2) + 1e-4
    assert (err < tol).all(), (single.mean, sharded.mean)


def test_mesh_subset_sizes():
    # 2- and 4-device meshes also work (driver dry-runs arbitrary n)
    prob = Problem(dirichlet=square_loop(1.0),
                   bc_dirichlet=lambda x, y: x + y)
    pts = np.array([[0.1, -0.1]])
    for n in (2, 4):
        solver = ShardedWoStSolver(prob, make_mesh(n), SolverOptions(target_slots=512))
        res = solver.solve(pts, n_walks=500, max_steps=100, eps=1e-3, seed=0)
        assert np.isfinite(res.mean).all()


def test_sharded_multi_source():
    prob = Problem(
        dirichlet=square_loop(2.0),
        bc_dirichlet=lambda x, y: x * x + y * y,
        source=[lambda x, y: -4.0 + 0.0 * x, lambda x, y: 0.0 * x],
    )
    mesh = make_mesh(8)
    solver = ShardedWoStSolver(prob, mesh, SolverOptions(target_slots=8192))
    pts = np.array([[0.0, 0.0], [1.0, 0.5]])
    res = solver.solve(pts, n_walks=4000, max_steps=300, eps=1e-3, seed=0)
    assert res.mean.shape == (2, 2)
    exact = pts[:, 0] ** 2 + pts[:, 1] ** 2
    err = np.abs(res.mean[0] - exact)
    assert (err < 4.0 * res.stderr[0] + 0.02).all(), (res.mean[0], exact)
    assert np.isfinite(res.mean[1]).all()


def test_sharded_crn_tightens_differences():
    # Regression: CRN used to be silently ignored on the sharded XLA path.
    # With slot-matched streams, nearby points' estimates move together so
    # their difference beats the independent-walk quadrature error.
    prob = Problem(dirichlet=square_loop(1.0),
                   bc_dirichlet=lambda x, y: x + 2.0 * y)
    pts = np.array([[0.3, 0.2], [0.31, 0.2]])
    mesh = make_mesh(8)
    solver = ShardedWoStSolver(
        prob, mesh,
        SolverOptions(target_slots=4096, common_random_numbers=True),
    )
    res = solver.solve(pts, n_walks=4000, max_steps=200, eps=1e-3, seed=0)
    exact = pts[:, 0] + 2 * pts[:, 1]
    assert (np.abs(res.mean - exact) < 4 * res.stderr + 5e-3).all()
    d_est = res.mean[1] - res.mean[0]
    d_exact = exact[1] - exact[0]
    quad = np.sqrt(res.stderr[0] ** 2 + res.stderr[1] ** 2)
    assert abs(d_est - d_exact) < max(0.7 * quad, 1e-3), (
        d_est, d_exact, quad
    )


def test_sharded_split_threshold_unbiased():
    # In-graph high-weight splitting on the sharded XLA path (slot-major
    # column pairing; per-device clone stream ranges): split-on must
    # agree with split-off within combined MC error while actually
    # splitting.
    import jax.numpy as jnp

    from dcrmontecarlo_tpu import Problem, square_loop

    bump = lambda x, y: 1.0 + 3.0 * jnp.exp(-((x * x + y * y) / 0.18))
    prob = Problem(dirichlet=square_loop(2.0),
                   bc_dirichlet=lambda x, y: 1.0 + x * y, alpha=bump)
    mesh = make_mesh(4)
    pts = np.array([[0.0, 0.0], [0.4, 0.2]], np.float32)
    res = {}
    for thr in (None, 1.5):
        s = ShardedWoStSolver(prob, mesh, SolverOptions(
            target_slots=2048, split_threshold=thr))
        res[thr] = s.solve(pts, n_walks=3000, max_steps=200, eps=2e-2,
                           seed=9)
    a, b = res[None], res[1.5]
    comb = np.sqrt(a.stderr**2 + b.stderr**2)
    dev = np.abs(a.mean - b.mean) / np.maximum(comb, 1e-12)
    assert (dev < 4.0).all(), (a.mean, b.mean, dev)
    assert b.total_steps > a.total_steps


def test_residual_robin_mode_removed():
    # robin_correction='residual' was removed in round 4 (measured worse
    # than the chain everywhere — THEORY.md 4e); requesting it must fail
    # loudly with a pointer at the supported realizations, not silently
    # fall back.
    import pytest

    prob = Problem(
        dirichlet=square_loop(1.0),
        bc_dirichlet=lambda x, y: x,
        alpha=lambda x, y: 1.0 + 0.5 * x * x,
    )
    s = WoStSolver(prob, SolverOptions(robin_correction="residual"))
    with pytest.raises(ValueError, match="removed"):
        s.solve(np.array([[0.0, 0.0]]), n_walks=8, max_steps=10, eps=0.1)


def test_sharded_boundary_snap_on_wall_starts():
    # sharded XLA + boundary_snap: near-wall evaluation points are
    # snapped ONTO the Neumann wall inside shard_body (replicated
    # points, slot-major tiling) and start on-boundary; gate against
    # the separable exact solution u = x/5 for alpha = exp(k y).
    import jax.numpy as jnp

    from dcrmontecarlo_tpu.geometry import Polyline

    k = 0.5
    alpha = lambda x, y: jnp.exp(k * y) + 0.0 * x
    prob = Problem(
        dirichlet=Polyline.from_points(
            [[-5.0, 0.0], [-5.0, -10.0], [5.0, -10.0], [5.0, 0.0]]),
        neumann=Polyline.from_points([[-5.0, 0.0], [5.0, 0.0]]),
        bc_dirichlet=lambda x, y: x / 5.0,
        alpha=alpha,
    )
    # within the auto snap tolerance (eps / 2 = 0.01)
    pts = np.array([[-3.0, -0.008], [3.0, -0.004]], np.float32)
    s = ShardedWoStSolver(prob, make_mesh(4), SolverOptions(
        target_slots=8192, robin_correction="chain"))
    r = s.solve(pts, n_walks=4000, max_steps=1500, eps=0.02, seed=5)
    exact = pts[:, 0] / 5.0
    dev = np.abs(r.mean - exact) / np.maximum(r.stderr, 1e-12)
    assert (dev < 4.0).all(), (r.mean, exact, r.stderr, dev)
    # the same config with splitting exercises the snap + split loop
    s2 = ShardedWoStSolver(prob, make_mesh(4), SolverOptions(
        target_slots=8192, robin_correction="chain", split_threshold=4.0))
    r2 = s2.solve(pts, n_walks=4000, max_steps=1500, eps=0.02, seed=6)
    dev2 = np.abs(r2.mean - exact) / np.maximum(r2.stderr, 1e-12)
    assert (dev2 < 4.0).all(), (r2.mean, exact, r2.stderr, dev2)


def test_sharded_progress_callback():
    # round-3 verdict item 5: the reference shows tqdm on its only
    # execution path (WoStSolver.py:182) and pod-scale solves run
    # sharded — progress must report there too. Device 0 reports its own
    # shard's walks-done scaled by the mesh size (device loops stay
    # collective-free), so the count is approximate mid-run but the
    # total is exact and the sequence monotone.
    prob = Problem(
        dirichlet=square_loop(1.0),
        bc_dirichlet=lambda x, y: x + 2.0 * y,
    )
    solver = ShardedWoStSolver(prob, make_mesh(4),
                               SolverOptions(target_slots=512))
    seen = []
    res = solver.solve(
        np.array([[0.1, 0.1], [0.2, -0.3]]), n_walks=64, max_steps=200,
        eps=1e-3, progress=lambda d, t, i: seen.append((d, t, i)),
    )
    assert np.isfinite(res.mean).all()
    assert len(seen) >= 1
    done = [d for d, _, _ in seen]
    assert done == sorted(done)
    assert all(t == 128 for _, t, _ in seen)
    assert all(0 <= d <= 128 for d in done)
    # a subsequent solve WITHOUT progress reuses the cache cleanly
    n_seen = len(seen)
    solver.solve(np.array([[0.1, 0.1], [0.2, -0.3]]), n_walks=64,
                 max_steps=200, eps=1e-3)
    assert len(seen) == n_seen


def test_sharded_pallas_progress_callback():
    # the sharded Pallas path reports once per kernel launch
    from jax.experimental.pallas import tpu as pltpu

    prob = Problem(
        dirichlet=square_loop(1.0),
        bc_dirichlet=lambda x, y: x + 2.0 * y,
    )
    solver = ShardedWoStSolver(
        prob, make_mesh(4),
        SolverOptions(backend="pallas", target_slots=256,
                      pallas_block_rows=1, pallas_inner_steps=16),
    )
    seen = []
    with pltpu.force_tpu_interpret_mode():
        res = solver.solve(
            np.array([[0.1, 0.1]]), n_walks=16, max_steps=50, eps=1e-2,
            progress=lambda d, t, i: seen.append((d, t, i)),
        )
    assert np.isfinite(res.mean).all()
    assert len(seen) >= 1
    done = [d for d, _, _ in seen]
    assert done == sorted(done)
    assert all(t == 16 for _, t, _ in seen)
