"""Walk-history tracing (rebuild of C11, the ``return_history`` path of
``solvers/WoStSolver.py:180-309``).

The reference threads a Python dict through the interpreted loop; that is
incompatible with (and unnecessary inside) a compiled batched solver, so
tracing is a *separate bounded capture*: a small walker batch (one slot per
walk, quota 1) is driven by the same compiled step function under
``lax.scan``, emitting fixed-shape per-step records. The result converts to
the reference's documented history schema (``WoStSolver.py:330-349``) via
:meth:`WalkHistory.to_dict` for the plotting utilities.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List

import numpy as np
import jax
import jax.numpy as jnp

from ..solver.state import init_state
from ..solver.wost import WoStSolver

__all__ = ["WalkHistory", "trace_walks"]


@dataclass
class WalkHistory:
    """Fixed-shape traced walks for one evaluation point.

    Step axis ``T`` = scan iterations; per-walk validity is given by
    ``active`` (True while the walk was still running *at the start of* the
    iteration — the position at that iteration is part of the path).
    """

    point: np.ndarray            # (2,) evaluation point
    positions: np.ndarray        # (n_walks, T, 2) walker position per step
    d_dirichlet: np.ndarray      # (n_walks, T)
    d_silhouette: np.ndarray     # (n_walks, T) +inf without Neumann
    radius: np.ndarray           # (n_walks, T) star radius
    source_contrib: np.ndarray   # (n_walks, T) source field 0 (see _all)
    boundary_contrib: np.ndarray  # (n_walks,) terminal BC contribution
                                  # (source-independent: paths don't
                                  # depend on f)
    active: np.ndarray           # (n_walks, T) bool
    walk_length: np.ndarray      # (n_walks,) steps taken
    total: np.ndarray            # (n_walks,) walk total, source field 0
    source_contrib_all: np.ndarray = None  # (n_src, n_walks, T): per-
                                  # source NEE record — multi-source
                                  # ensembles (pseudosection sweeps,
                                  # sensitivity adjoints) trace every
                                  # current dipole from the ONE shared
                                  # walk set (reference records per-walk
                                  # contributions at WoStSolver.py:261-267
                                  # but is single-source)
    total_all: np.ndarray = None  # (n_src, n_walks) walk totals per source

    @property
    def n_src(self) -> int:
        return 1 if self.source_contrib_all is None else \
            self.source_contrib_all.shape[0]

    def to_dict(self, source: int = 0) -> Dict[int, List[dict]]:
        """Reference history schema (``WoStSolver.py:330-349``) for a single
        point index 0; ``source`` selects which source field's
        contributions/totals are reported (multi-source ensembles)."""
        if source == 0 or self.source_contrib_all is None:
            src_c, tot = self.source_contrib, self.total
        else:
            src_c = self.source_contrib_all[source]
            tot = self.total_all[source]
        walks = []
        for w in range(self.positions.shape[0]):
            T = int(self.walk_length[w]) + 1
            path = [
                {
                    "point": self.positions[w, t],
                    "dirichlet_distance": float(self.d_dirichlet[w, t]),
                    "neumann_distance": (
                        float(self.d_silhouette[w, t])
                        if np.isfinite(self.d_silhouette[w, t])
                        else None
                    ),
                }
                for t in range(min(T, self.positions.shape[1]))
            ]
            contributions = [
                {
                    "step": t,
                    "type": "source",
                    "point": self.positions[w, t],
                    "contribution": float(src_c[w, t]),
                }
                for t in range(self.positions.shape[1])
                if src_c[w, t] != 0.0
            ]
            contributions.append(
                {
                    "step": int(self.walk_length[w]),
                    "type": "boundary",
                    "point": self.positions[w, min(T - 1, self.positions.shape[1] - 1)],
                    "contribution": float(self.boundary_contrib[w]),
                }
            )
            walks.append(
                {
                    "walk_id": w,
                    "path": path,
                    "contributions": contributions,
                    "total_contribution": float(tot[w]),
                }
            )
        return {0: walks}


def trace_walks(
    solver: WoStSolver,
    point,
    n_walks: int = 16,
    max_steps: int = 200,
    eps: float = 1e-3,
    seed: int = 0,
) -> WalkHistory:
    """Run ``n_walks`` traced walks from ``point`` and capture every step."""
    step = solver._make_step_core(eps, max_steps)
    p = np.asarray(point, np.float32).reshape(2)
    p0x = jnp.full((n_walks,), p[0])
    p0y = jnp.full((n_walks,), p[1])
    quotas = jnp.ones((n_walks,), jnp.int32)
    n_src = max(1, len(solver.problem.source_fields))
    state0 = init_state(p0x, p0y, quotas, n_src=n_src)
    key = jax.random.PRNGKey(seed)
    T = max_steps + 2

    def body(state, _):
        new_state, diag = step(state, p0x, p0y, key)
        rec = {
            "px": state.px,
            "py": state.py,
            "dD": diag["d_dirichlet"],
            "dS": diag["d_silhouette"],
            "r": diag["radius"],
            "src": diag["source_contrib"],
            "bnd": diag["boundary_contrib"],
            "active": state.quota > 0,
        }
        return new_state, rec

    final, recs = jax.lax.scan(body, state0, None, length=T)
    positions = np.stack(
        [np.asarray(recs["px"]).T, np.asarray(recs["py"]).T], axis=-1
    )
    active = np.asarray(recs["active"]).T
    total_all = np.asarray(final.acc_sum)      # (n_src, n_walks)
    # recs["src"] is (T, n_src, n_walks): scan stacked the per-step
    # (n_src, W) records along a leading step axis
    src_all = np.transpose(np.asarray(recs["src"]), (1, 2, 0))
    boundary = np.asarray(recs["bnd"]).T.sum(axis=1)
    walk_length = np.maximum(active.sum(axis=1) - 1, 0)
    return WalkHistory(
        point=p,
        positions=positions,
        d_dirichlet=np.asarray(recs["dD"]).T,
        d_silhouette=np.asarray(recs["dS"]).T,
        radius=np.asarray(recs["r"]).T,
        source_contrib=src_all[0],
        boundary_contrib=boundary,
        active=active,
        walk_length=walk_length,
        total=total_all[0],
        source_contrib_all=src_all,
        total_all=total_all,
    )
