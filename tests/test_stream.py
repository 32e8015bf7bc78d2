"""Streaming solve accumulation tests."""

import numpy as np

from dcrmontecarlo_tpu import Problem, WoStSolver, square_loop
from dcrmontecarlo_tpu.solver import SolverOptions, solve_stream


def _solver():
    prob = Problem(
        dirichlet=square_loop(1.0),
        bc_dirichlet=lambda x, y: x + 2.0 * y,
    )
    return WoStSolver(prob, SolverOptions(target_slots=2048))


def test_stream_matches_single_solve_statistics():
    solver = _solver()
    pts = np.array([[0.0, 0.0], [0.4, -0.2]])
    res = solve_stream(solver, pts, n_walks_total=4000, batch_walks=1000,
                       max_steps=200, eps=1e-3, seed=0)
    assert res.n_walks == 4000
    exact = pts[:, 0] + 2.0 * pts[:, 1]
    err = np.abs(res.mean - exact)
    assert (err < 4 * res.stderr + 5e-3).all(), (res.mean, exact, res.stderr)
    # stderr scale consistent with a direct solve of the same size
    direct = solver.solve(pts, n_walks=4000, max_steps=200, eps=1e-3, seed=9)
    ratio = res.stderr / np.maximum(direct.stderr, 1e-12)
    assert (ratio > 0.5).all() and (ratio < 2.0).all(), ratio


def test_stream_callback_and_partial_results():
    solver = _solver()
    pts = np.array([[0.1, 0.1]])
    seen = []
    solve_stream(solver, pts, n_walks_total=900, batch_walks=300,
                 max_steps=100, eps=1e-3, seed=1,
                 callback=lambda i, r: seen.append((i, r.n_walks)))
    assert seen == [(1, 300), (2, 600), (3, 900)]


def test_stream_resume():
    solver = _solver()
    pts = np.array([[0.2, -0.1]])
    partial = solve_stream(solver, pts, n_walks_total=600, batch_walks=300,
                           max_steps=100, eps=1e-3, seed=2)
    state = solver._stream_state
    full = solve_stream(solver, pts, n_walks_total=1200, batch_walks=300,
                        max_steps=100, eps=1e-3, seed=2, state=state)
    assert full.n_walks == 1200
    assert full.iterations == 4  # 2 resumed + 2 new batches
    exact = 0.2 + 2 * (-0.1)
    assert abs(full.mean[0] - exact) < 4 * full.stderr[0] + 5e-3


def test_stream_single_batch_exactly_matches_direct_solve():
    # With raw (sum, sumsq) moments carried on SolveResult, a one-batch
    # stream is bit-identical to the direct solve (pre-fix it round-tripped
    # through stderr and only matched to ~1e-6).
    solver = _solver()
    pts = np.array([[0.0, 0.0], [0.4, -0.2]])
    direct = solver.solve(pts, n_walks=1000, max_steps=200, eps=1e-3, seed=0)
    stream = solve_stream(solver, pts, n_walks_total=1000, batch_walks=1000,
                          max_steps=200, eps=1e-3, seed=0)
    # the carried raw moments are bit-identical ...
    np.testing.assert_array_equal(solver._stream_state.sum, direct.walk_sum)
    np.testing.assert_array_equal(solver._stream_state.sumsq,
                                  direct.walk_sumsq)
    # ... and mean/stderr agree to the final-division ulp (device f32 vs
    # numpy f32 division)
    np.testing.assert_allclose(stream.mean, direct.mean, rtol=2e-7)
    np.testing.assert_allclose(stream.stderr, direct.stderr, rtol=2e-6)


def test_solve_to_tolerance_reaches_target():
    # Adaptive batching stops once every point's stderr meets the target
    # (and not before): the result must satisfy the criterion, use more
    # than one batch, and agree with the analytic solution.
    from dcrmontecarlo_tpu.solver import solve_to_tolerance

    prob = Problem(dirichlet=square_loop(1.0),
                   bc_dirichlet=lambda x, y: x + 2.0 * y)
    solver = WoStSolver(prob, SolverOptions(target_slots=4096))
    pts = np.array([[0.0, 0.0], [0.4, -0.2]], np.float32)
    seen = []
    res = solve_to_tolerance(solver, pts, target_stderr=8e-3,
                             batch_walks=1024, max_walks=1 << 17,
                             max_steps=300, eps=1e-3, seed=5,
                             callback=lambda i, r: seen.append(r.stderr.max()))
    assert res.stderr.max() <= 8e-3, res.stderr
    assert res.iterations > 1, res.iterations  # actually adapted
    assert seen[0] > 8e-3  # first batch alone was not enough
    exact = pts[:, 0] + 2.0 * pts[:, 1]
    dev = np.abs(res.mean - exact) / np.maximum(res.stderr, 1e-12)
    assert (dev < 4.0).all(), (res.mean, exact, dev)


def test_solve_to_tolerance_relative_floor_terminates():
    # An antisymmetric BC gives mean ~ 0 with nonzero variance: relative
    # mode's threshold ~ 0 would run the full max_walks budget; the
    # absolute relative_floor lets the criterion engage and stop early.
    from dcrmontecarlo_tpu.solver import solve_to_tolerance

    prob = Problem(dirichlet=square_loop(1.0),
                   bc_dirichlet=lambda x, y: x)
    solver = WoStSolver(prob, SolverOptions(target_slots=4096))
    pts = np.array([[0.0, 0.0]], np.float32)  # mean is exactly 0
    res = solve_to_tolerance(solver, pts, target_stderr=0.05, relative=True,
                             relative_floor=1.0, batch_walks=512,
                             max_walks=1 << 16, max_steps=300, eps=1e-3,
                             seed=7)
    assert res.stderr.max() <= 0.05  # floor scale 1.0 * target 0.05
    assert res.n_walks < (1 << 16)  # stopped before the budget cap


def test_solve_to_tolerance_budget_cap_and_resume():
    # max_walks bounds the budget; resuming with a looser target returns
    # immediately, and topping up with a tighter target continues from
    # the stored state instead of restarting.
    from dcrmontecarlo_tpu.solver import solve_to_tolerance

    prob = Problem(dirichlet=square_loop(1.0),
                   bc_dirichlet=lambda x, y: x * x - y * y)
    solver = WoStSolver(prob, SolverOptions(target_slots=4096))
    pts = np.array([[0.2, 0.1]], np.float32)
    res = solve_to_tolerance(solver, pts, target_stderr=1e-9,
                             batch_walks=1024, max_walks=2048,
                             max_steps=300, eps=1e-3, seed=3)
    assert res.n_walks == 2048  # budget-capped
    st = solver._stream_state
    res2 = solve_to_tolerance(solver, pts, target_stderr=1.0,
                              batch_walks=1024, max_walks=2048,
                              max_steps=300, eps=1e-3, seed=3, state=st)
    assert res2.n_walks == 2048  # already satisfied: no new batches
    res3 = solve_to_tolerance(solver, pts,
                              target_stderr=res.stderr.max() * 0.7,
                              batch_walks=1024, max_walks=1 << 14,
                              max_steps=300, eps=1e-3, seed=3, state=st)
    assert res3.n_walks > 2048  # topped up from the stored state
    assert res3.stderr.max() <= res.stderr.max() * 0.7
