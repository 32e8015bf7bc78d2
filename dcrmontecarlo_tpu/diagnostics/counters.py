"""Solver observability: occupancy / termination statistics.

The reference's only observability is tqdm progress bars and prints
(SURVEY.md §5). Here a cheap device-side profile runs the same compiled
step under ``lax.scan`` for a bounded number of iterations and reduces
per-iteration occupancy — the quantity that governs batched-WoSt
throughput (walk-length divergence, SURVEY §7 hard part 3).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from ..solver.state import init_state
from ..solver.wost import WoStSolver

__all__ = ["OccupancyProfile", "profile_occupancy"]


@dataclass
class OccupancyProfile:
    active_per_iter: np.ndarray   # (T,) active walkers per loop iteration
    walks_done_per_iter: np.ndarray  # (T,)
    n_slots: int

    @property
    def mean_occupancy(self) -> float:
        live = self.active_per_iter > 0
        if not live.any():
            return 0.0
        return float(self.active_per_iter[live].mean() / self.n_slots)

    @property
    def iterations(self) -> int:
        return int((self.active_per_iter > 0).sum())


def profile_occupancy(
    solver: WoStSolver,
    points,
    n_walks: int = 64,
    max_steps: int = 200,
    eps: float = 1e-3,
    seed: int = 0,
    max_iters: int = 512,
) -> OccupancyProfile:
    """Measure per-iteration active-walker occupancy for a solve setup."""
    step = solver._make_step_core(eps, max_steps)
    pts = np.asarray(points, np.float32).reshape(-1, 2)
    K, quota_row = solver._slot_layout(pts.shape[0], n_walks)
    quotas = jnp.asarray(np.tile(quota_row, pts.shape[0]))
    p0x = jnp.repeat(jnp.asarray(pts[:, 0]), K)
    p0y = jnp.repeat(jnp.asarray(pts[:, 1]), K)
    n_src = max(1, len(solver.problem.source_fields))
    state0 = init_state(p0x, p0y, quotas, n_src=n_src)
    key = jax.random.PRNGKey(seed)

    def body(state, _):
        new_state, diag = step(state, p0x, p0y, key)
        return new_state, {
            "active": jnp.sum(diag["stepping"].astype(jnp.int32)),
            "done": jnp.sum(diag["walk_done"].astype(jnp.int32)),
        }

    _, recs = jax.lax.scan(body, state0, None, length=max_iters)
    return OccupancyProfile(
        active_per_iter=np.asarray(recs["active"]),
        walks_done_per_iter=np.asarray(recs["done"]),
        n_slots=int(p0x.shape[0]),
    )
