"""Streaming/batched solving: unbounded walk counts with progress.

The reference exposes only a blocking ``solve`` with a tqdm bar
(``WoStSolver.py:182``). Production surveys want (a) walk counts beyond a
single device launch, (b) progress reporting, and (c) interruptible /
resumable accumulation. ``solve_stream`` runs fixed-size batches of walks
(one compiled executable, re-invoked with fresh seeds) and combines their
``(sum, sumsq)`` statistics exactly; the running :class:`StreamState` is a
plain pytree of numpy arrays that can be checkpointed and resumed.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

import numpy as np

from .wost import SolveResult, WoStSolver

__all__ = ["StreamState", "solve_stream", "solve_to_tolerance"]


@dataclass
class StreamState:
    """Running accumulation over batches (checkpointable)."""

    sum: np.ndarray       # (..., N) running sum of walk totals
    sumsq: np.ndarray     # (..., N) running sum of squared walk totals
    n_walks: int = 0
    total_steps: float = 0.0
    batches: int = 0
    points: np.ndarray = None  # (N, 2) the evaluation points these
                               # statistics belong to; resuming with
                               # different points raises instead of
                               # silently mixing locations

    def result(self) -> SolveResult:
        mean = self.sum / max(self.n_walks, 1)
        var = np.maximum(self.sumsq / max(self.n_walks, 1) - mean * mean, 0.0)
        stderr = np.sqrt(var / max(self.n_walks, 1))
        return SolveResult(
            mean=mean,
            stderr=stderr,
            n_walks=self.n_walks,
            total_steps=self.total_steps,
            iterations=self.batches,
        )


def solve_stream(
    solver: WoStSolver,
    points,
    n_walks_total: int,
    batch_walks: int = 4096,
    max_steps: int = 1000,
    eps: float = 1e-4,
    seed: int = 0,
    callback: Optional[Callable[[int, SolveResult], None]] = None,
    state: Optional[StreamState] = None,
) -> SolveResult:
    """Accumulate ``n_walks_total`` walks per point in batches.

    Args:
        callback: called after each batch with ``(batch_index,
            partial SolveResult)`` — progress bars, early stopping on
            stderr, checkpointing.
        state: resume from a previous run's :class:`StreamState`
            (``solve_stream`` stores it on ``solver._stream_state``).

    Returns:
        Combined :class:`SolveResult` over all accumulated walks.
    """
    if n_walks_total <= 0:
        raise ValueError(f"n_walks_total must be positive, got {n_walks_total}")
    pts = np.asarray(points, np.float32).reshape(-1, 2)
    state = _check_resume_points(state, pts)
    done = state.n_walks if state is not None else 0
    while done < n_walks_total:
        n = min(batch_walks, n_walks_total - done)
        state = _accumulate_batch(
            solver, pts, n, max_steps, eps, seed, state, callback
        )
        done = state.n_walks
    solver._stream_state = state
    return state.result()


def _check_resume_points(state: Optional[StreamState], pts) -> Optional[StreamState]:
    """Refuse to resume statistics accumulated at different points."""
    if state is None:
        return None
    if state.points is not None and not (
        state.points.shape == pts.shape
        and np.array_equal(state.points, pts)
    ):
        raise ValueError(
            "StreamState was accumulated at different evaluation points; "
            "resuming here would silently mix statistics for different "
            "locations. Start a fresh stream (state=None) instead."
        )
    return state


def _accumulate_batch(solver, pts, n, max_steps, eps, seed, state, callback):
    """One batch: solve, merge exact raw moments, fire the callback.

    The single accumulation body shared by :func:`solve_stream` and
    :func:`solve_to_tolerance` — the (sum, sumsq) merge and the seed
    stride live in exactly one place.
    """
    batch_idx = state.batches if state is not None else 0
    res = solver.solve(
        pts, n_walks=n, max_steps=max_steps, eps=eps,
        seed=seed + 1000003 * batch_idx,
    )
    # exact raw moments from the solve (no stderr round-trip)
    b_sum = np.asarray(res.walk_sum)
    b_sumsq = np.asarray(res.walk_sumsq)
    if state is None:
        state = StreamState(sum=b_sum, sumsq=b_sumsq, points=pts.copy())
    else:
        if np.shape(state.sum) != np.shape(b_sum):
            raise ValueError(
                f"StreamState moment shape {np.shape(state.sum)} does not "
                f"match this solve's {np.shape(b_sum)} — the problem's "
                "source list changed since the state was accumulated "
                "(set_source_term?). Start a fresh stream (state=None)."
            )
        state.sum = state.sum + b_sum
        state.sumsq = state.sumsq + b_sumsq
        if state.points is None:
            state.points = pts.copy()
    state.n_walks += n
    state.total_steps += res.total_steps
    state.batches += 1
    if callback is not None:
        callback(state.batches, state.result())
    return state


def solve_to_tolerance(
    solver: WoStSolver,
    points,
    target_stderr: float,
    relative: bool = False,
    relative_floor: float = 0.0,
    batch_walks: int = 4096,
    max_walks: int = 1 << 20,
    max_steps: int = 1000,
    eps: float = 1e-4,
    seed: int = 0,
    callback: Optional[Callable[[int, SolveResult], None]] = None,
    state: Optional[StreamState] = None,
) -> SolveResult:
    """Accumulate walk batches until the MC error meets a target.

    Adaptive sampling for production use: instead of guessing ``n_walks``
    up front (the reference's only mode), keep adding fixed-size batches
    (one compiled executable, re-invoked with fresh seeds) until every
    point's standard error is at or below ``target_stderr`` — absolute,
    or relative to the largest ``|mean|`` across points when
    ``relative=True`` (a survey-scale criterion that doesn't stall on
    near-zero-potential electrodes). ``max_walks`` bounds the budget;
    the returned result reports whatever accuracy that budget bought.

    Relative mode needs a nonzero signal: when every point's mean is ~0
    (symmetric dipole layouts, early noisy batches) the threshold is ~0
    and the loop runs to ``max_walks``. ``relative_floor`` (an absolute
    solution-units scale) floors the signal estimate so such runs still
    terminate: the effective threshold is
    ``target_stderr * max(max|mean|, relative_floor)``.

    The running :class:`StreamState` is stored on
    ``solver._stream_state`` exactly like :func:`solve_stream`, so a
    tolerance run can be checkpointed, resumed, or topped up later with
    a tighter target.
    """
    if max_walks <= 0:
        raise ValueError(f"max_walks must be positive, got {max_walks}")
    pts = np.asarray(points, np.float32).reshape(-1, 2)
    state = _check_resume_points(state, pts)
    done = state.n_walks if state is not None else 0
    while True:
        if state is not None:
            res = state.result()
            thr = target_stderr * (
                max(float(np.max(np.abs(res.mean))), relative_floor)
                if relative else 1.0
            )
            if np.max(res.stderr) <= thr:
                break
            if done >= max_walks:
                break
        n = min(batch_walks, max_walks - done)
        if n <= 0:
            break
        state = _accumulate_batch(
            solver, pts, n, max_steps, eps, seed, state, callback
        )
        done = state.n_walks
    solver._stream_state = state
    return state.result()
