"""Electric-field (gradient) estimation.

DCR instruments measure potential *differences*; the physical quantity is
the electric field ``E = -grad u``. The reference has no gradient
capability. Here the gradient is estimated by central differences over
CRN-correlated solves: common random numbers make walks from ``x +/- h``
follow nearly identical paths, so the difference quotient cancels the
shared MC noise that would otherwise require ``O(1/h^2)`` more walks —
the classic correlated-finite-difference estimator.

Bias is the usual ``O(h^2)`` central-difference term plus the walk
decorrelation growing with ``h``; ``h`` around ``1e-2`` of the local
feature scale works well (see ``tests/test_efield.py``).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

from ..solver.wost import SolverOptions, WoStSolver

__all__ = ["EFieldResult", "estimate_field"]


class EFieldResult(NamedTuple):
    ex: np.ndarray        # (N,) E_x = -du/dx; (n_src, N) for multi-source
    ey: np.ndarray        # (N,) E_y = -du/dy; (n_src, N) for multi-source
    ex_stderr: np.ndarray  # n_batches <= 1: conservative quadrature
    ey_stderr: np.ndarray  # BOUNDS; n_batches > 1: EMPIRICAL stderr of
                           # the batch mean (B-sample estimate — itself
                           # ~1/sqrt(2(B-1)) relatively noisy, and no
                           # longer an upper bound)
    potential: np.ndarray  # (N,) u at the stencil centers
    ex_batches: np.ndarray = None  # (B, ...) per-batch fields when
    ey_batches: np.ndarray = None  # n_batches > 1: independent replicas
                                   # for EMPIRICAL error bars of derived
                                   # quantities (e.g. the E_s.E_a products
                                   # of sensitivity maps, whose factor
                                   # errors are CRN-correlated and defeat
                                   # first-order propagation)


def estimate_field(
    problem,
    points,
    h: float,
    n_walks: int = 4000,
    max_steps: int = 1000,
    eps: float = 1e-4,
    seed: int = 0,
    options: SolverOptions = None,
    n_batches: int = 1,
) -> EFieldResult:
    """Estimate ``E = -grad u`` at ``points`` with step ``h``.

    Builds the 5-point stencil ``{x, x+-h e_x, x+-h e_y}`` for every point
    and solves all stencil points in ONE CRN-correlated solve (stencil
    points sit adjacent in the slot layout, so slot-matched RNG streams
    correlate their walks maximally).

    ``n_batches > 1`` splits the walk budget (exactly — remainders go to
    the first batches) into independent replicas with hashed seeds,
    switching ``ex_stderr``/``ey_stderr`` to the EMPIRICAL stderr of the
    batch mean and filling ``ex_batches``/``ey_batches`` for derived-
    quantity error bars (see ``SensitivityResult.stderr``).
    """
    pts = np.asarray(points, np.float32).reshape(-1, 2)
    n = len(pts)
    stencil = np.concatenate([
        pts,
        pts + [h, 0.0],
        pts - [h, 0.0],
        pts + [0.0, h],
        pts - [0.0, h],
    ]).astype(np.float32)
    if options is None:
        # the survey pipelines' measured-optimum defaults (roulette and
        # compaction are no-ops on problems that can't use them)
        from .dcr import survey_default_options

        base = survey_default_options()
    else:
        base = options
    opts = SolverOptions(**{
        **base.__dict__,
        "common_random_numbers": True,
        "rng": "fast",  # CRN streams work on both backends now
    })
    solver = WoStSolver(problem, opts)

    def one(seed_b, walks_b):
        res = solver.solve(stencil, n_walks=walks_b, max_steps=max_steps,
                           eps=eps, seed=seed_b)
        # single-source solves return (5n,); multi-source (n_src, 5n) —
        # the stencil axis is always the trailing one
        multi = res.mean.ndim == 2
        u = res.mean.reshape(-1, 5, n)
        se = res.stderr.reshape(-1, 5, n)
        ex = -(u[:, 1] - u[:, 2]) / (2 * h)
        ey = -(u[:, 3] - u[:, 4]) / (2 * h)
        return multi, ex, ey, se, u[:, 0]

    if n_batches <= 1:
        multi, ex, ey, se, pot = one(seed, n_walks)
        ex_err = np.sqrt(se[:, 1] ** 2 + se[:, 2] ** 2) / (2 * h)
        ey_err = np.sqrt(se[:, 3] ** 2 + se[:, 4] ** 2) / (2 * h)
        exb = eyb = None
    else:
        # independent batches share ONE compiled solve per walk count;
        # their spread yields honest error bars for any derived
        # quantity, CRN correlations included. Batch seeds are HASHED
        # (not arithmetically spaced) so distinct user seeds can never
        # alias onto each other's batch streams.
        from ..sampling.rng import mix32

        n_batches = min(n_batches, max(1, n_walks))
        base, rem = divmod(n_walks, n_batches)  # exact total walk budget
        runs = []
        for b in range(n_batches):
            seed_b = int(mix32(np.uint32(seed) ^ np.uint32(
                (0xB5297A4D * (b + 1)) & 0xFFFFFFFF)))
            runs.append(one(seed_b, base + (1 if b < rem else 0)))
        multi = runs[0][0]
        exb = np.stack([r[1] for r in runs])   # (B, n_src, N)
        eyb = np.stack([r[2] for r in runs])
        ex = exb.mean(axis=0)
        ey = eyb.mean(axis=0)
        # empirical stderr of the batch mean
        ex_err = exb.std(axis=0, ddof=1) / np.sqrt(n_batches)
        ey_err = eyb.std(axis=0, ddof=1) / np.sqrt(n_batches)
        pot = np.mean([r[4] for r in runs], axis=0)
    if not multi:
        ex, ey, ex_err, ey_err, pot = (
            a[0] for a in (ex, ey, ex_err, ey_err, pot)
        )
        if exb is not None:
            exb, eyb = exb[:, 0], eyb[:, 0]
    return EFieldResult(ex=ex, ey=ey, ex_stderr=ex_err, ey_stderr=ey_err,
                        potential=pot, ex_batches=exb, ey_batches=eyb)
