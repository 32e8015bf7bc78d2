"""Per-step unbiasedness audit: martingale increments by pre-step bucket.

For an unbiased step operator and the exact solution ``u`` of the
problem, the per-walker quantity

    est_t = walk_acc_t + atten_t * u(x_t)        (live walker)
          = acc_sum                              (banked, once done)

is a martingale: ``E[est_{t+1} - est_t | any pre-step event] = 0``. The
only systematic exception is the designed eps-shell completion bias
(the walk banks the boundary value at the eps-shell / projected point,
not at ``x_t`` exactly), which the ``completing`` bucket isolates — so a
correct solver shows ~zero mean increment in every *other* bucket, and
any per-step physics leak shows up in the bucket whose machinery causes
it, long before it is resolvable in whole-walk estimates. Bucketing is
by PRE-step state (valid conditioning; bucketing by the step's *own*
outcome would condition on the future and bias every bucket).

This auditor found/rebutted the §4f suspects (THEORY.md): it cleanly
separates eps-shell completion bias from genuine operator leaks, and
its ``robin_correction=False`` run shows the textbook unrealized-Robin
deficit in the on-boundary buckets (a built-in positive control — see
``tests/test_martingale_audit.py``).

The reference has no analogue (its only consistency check is eyeballing
RMSE decay, ``tests/testWoStCorrectness.py:187-196``); this is the kind
of estimator-level audit a production MC framework needs to localize
sub-percent biases.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional, Sequence

import numpy as np

__all__ = ["MartingaleReport", "martingale_audit", "grid_continuation"]

BUCKET_NAMES = (
    "far-interior",   # ball does not reach a Neumann wall
    "near-wall",      # interior, ball reaches a Neumann wall (hits possible)
    "on-boundary",    # standing on a Neumann wall (chord/hemisphere machinery)
    "onb-pristine",   # on-boundary at step 0 (snapped starts; no history)
    "completing",     # the walk banks this step (designed eps-shell bias)
)


@dataclass
class MartingaleReport:
    """Cross-seed bucket statistics of per-step martingale increments."""

    bucket_names: Sequence[str]
    mean: np.ndarray            # (B,) mean increment per visit
    sem: np.ndarray             # (B,) cross-seed standard error of the mean
    visits_per_walk: np.ndarray  # (B,) average visits per walker
    n: np.ndarray               # (B,) total increments audited
    # walk-level bias decomposition: mean * visits_per_walk per bucket
    # (sums to the whole-walk bias accumulated over the audited steps)

    @property
    def walk_bias(self) -> np.ndarray:
        return self.mean * self.visits_per_walk

    def __str__(self) -> str:
        lines = []
        for i, nm in enumerate(self.bucket_names):
            if self.n[i] == 0:
                continue
            lines.append(
                f"{nm:13s} n/walk {self.visits_per_walk[i]:8.2f} "
                f"mean-inc {self.mean[i]:+.5f} +- {self.sem[i]:.5f} "
                f"(walk-bias contrib {self.walk_bias[i]:+.4f})"
            )
        return "\n".join(lines)


def grid_continuation(xs, ys, u):
    """jnp-traceable bilinear interpolant of a grid field ``u[ix, iy]``.

    Mirrors ``validation.fdm.FDMSolution.__call__`` (numpy) for use as a
    traced ``continuation`` when no closed-form exact solution exists
    (e.g. auditing the notebook survey against the FDM oracle).
    """
    import jax.numpy as jnp

    xs = np.asarray(xs, np.float32)
    ys = np.asarray(ys, np.float32)
    u = jnp.asarray(np.asarray(u, np.float32))
    nx, ny = u.shape
    x0, dx = float(xs[0]), float(xs[1] - xs[0])
    y0, dy = float(ys[0]), float(ys[1] - ys[0])

    def cont(px, py):
        fx = jnp.clip((px - x0) / dx, 0.0, nx - 1.000001)
        fy = jnp.clip((py - y0) / dy, 0.0, ny - 1.000001)
        ix = fx.astype(jnp.int32)
        iy = fy.astype(jnp.int32)
        tx = fx - ix
        ty = fy - iy
        return (
            (1 - tx) * (1 - ty) * u[ix, iy]
            + tx * (1 - ty) * u[ix + 1, iy]
            + (1 - tx) * ty * u[ix, iy + 1]
            + tx * ty * u[ix + 1, iy + 1]
        )

    return cont


def martingale_audit(
    problem,
    options,
    point,
    *,
    continuation: Callable,
    eps: float,
    on_boundary: bool = False,
    normal: Optional[Sequence[float]] = None,
    n_steps: int = 48,
    n_walkers: int = 1 << 18,
    n_seeds: int = 8,
    seed0: int = 0,
    max_steps: int = 60000,
    source_index: int = 0,
    normalize_by_atten: bool = False,
    atten_bands=None,
    step_bands=None,
) -> MartingaleReport:
    """Audit the production step operator from a controlled start state.

    Args:
        problem / options: as for ``WoStSolver`` (the audit builds the
            solver's own ``_make_step_core`` — it tests the REAL step,
            not a reimplementation). ``options.backend`` should be
            ``"xla"``; the Pallas kernel is covered by the matched-seed
            backend-equality tests instead.
        point: ``(x, y)`` start position for every walker.
        continuation: traceable exact/oracle solution ``u(px, py)`` of
            the UNTRANSFORMED problem.
        eps / max_steps: walk parameters (the step is built with them).
        on_boundary / normal: start standing on a Neumann wall with the
            given inward normal (the snapped-electrode configuration).
        n_steps: steps audited per seed (walks may continue beyond; the
            audit is per-step, so truncation costs power, not validity).
        n_walkers / n_seeds / seed0: power; SEMs are cross-seed.
        source_index: which source's accumulator defines ``est``.
        normalize_by_atten: divide each increment by the PRE-step atten.
            The step is linear in atten, so ``E[inc/atten | bucket] = 0``
            still characterizes an unbiased operator — and the walk's
            weight spread (which otherwise dominates the variance and
            grows with depth) cancels, typically tightening per-visit
            SEMs by 1-2 orders of magnitude. The atten-weighted (raw)
            mode remains the one whose bucket sums add up to the actual
            walk bias; use raw to SIZE a leak, normalized to FIND it.
        atten_bands: optional increasing ``|atten|`` edges (e.g.
            ``[0.5, 2.0, 8.0]``) — each state bucket splits by the
            PRE-step weight magnitude into ``len+1`` sub-buckets,
            labelled ``name@a<edge`` / ``name@a>=last``. A leak that is
            invisible per-unit-weight but rides the atten x residual
            CORRELATION (THEORY.md §4f: E[inc/atten] ~ 0 in every state
            bucket while the raw sums are biased) shows up as nonzero
            raw means concentrated in the heavy bands.
        step_bands: optional increasing step-index edges (e.g.
            ``[16, 64, 256]``) — further splits by the scan step t, so
            late-walk leaks (state distributions decohered from the
            controlled start) separate from the first visits.

    Returns a :class:`MartingaleReport` over the buckets in
    ``BUCKET_NAMES``.
    """
    import jax
    import jax.numpy as jnp

    from ..geometry import queries
    from ..solver.state import init_state
    from ..solver.wost import WoStSolver

    solver = WoStSolver(problem, options)
    step = solver._make_step_core(eps=eps, max_steps=max_steps)
    rmin = options.rmin_factor * eps
    neumann = problem.neumann
    dirichlet = problem.dirichlet
    n_src = max(1, len(problem.source_fields))

    px0, py0 = float(point[0]), float(point[1])
    if on_boundary and normal is None:
        raise ValueError("on_boundary start needs the inward normal")
    nx0, ny0 = (float(normal[0]), float(normal[1])) if normal else (0.0, 0.0)
    W = int(n_walkers)
    si = int(source_index)
    a_edges = (np.asarray(sorted(atten_bands), np.float32)
               if atten_bands else None)
    s_edges = (np.asarray(sorted(step_bands), np.int32)
               if step_bands else None)
    NA = 1 if a_edges is None else len(a_edges) + 1
    NS = 1 if s_edges is None else len(s_edges) + 1
    names = []
    for nm in BUCKET_NAMES:
        for ai in range(NA):
            a_tag = "" if a_edges is None else (
                f"@a<{a_edges[ai]:g}" if ai < len(a_edges)
                else f"@a>={a_edges[-1]:g}")
            for six in range(NS):
                s_tag = "" if s_edges is None else (
                    f"@t<{s_edges[six]}" if six < len(s_edges)
                    else f"@t>={s_edges[-1]}")
                names.append(nm + a_tag + s_tag)
    NB = len(names)

    def run(key):
        p0x = jnp.full((W,), px0, jnp.float32)
        p0y = jnp.full((W,), py0, jnp.float32)
        ob_a = jnp.full((W,), bool(on_boundary))
        nx_a = jnp.full((W,), nx0, jnp.float32)
        ny_a = jnp.full((W,), ny0, jnp.float32)
        st = init_state(p0x, p0y, jnp.ones((W,), jnp.int32), n_src=n_src)
        st = st._replace(on_bdry=ob_a, nx=nx_a, ny=ny_a)

        def est_of(s):
            live = s.n_done < 1
            return jnp.where(
                live, s.walk_acc[si] + s.atten * continuation(s.px, s.py),
                s.acc_sum[si])

        def body(carry, t):
            s = carry
            pre_est = est_of(s)
            pre_live = s.n_done < 1
            if normalize_by_atten:
                pre_live = pre_live & (jnp.abs(s.atten) > 1e-9)
            dD = queries.distance(dirichlet, s.px, s.py)
            if neumann is not None:
                d_sil = queries.silhouette_distance(neumann, s.px, s.py)
                d_neu = queries.distance(neumann, s.px, s.py)
            else:
                d_sil = jnp.full_like(dD, jnp.inf)
                d_neu = jnp.full_like(dD, jnp.inf)
            r_pre = jnp.maximum(rmin, jnp.minimum(dD, d_sil))
            pre_att = s.atten
            s1, _ = step(s, p0x, p0y, key, p0ob=ob_a, p0nx=nx_a, p0ny=ny_a)
            inc = jnp.where(pre_live, est_of(s1) - pre_est, 0.0)
            if normalize_by_atten:
                inc = inc / jnp.where(pre_live, pre_att, 1.0)
            bucket = jnp.where(
                s.on_bdry,
                jnp.where(t == 0, 3, 2),
                jnp.where(d_neu < r_pre, 1, 0))
            bucket = jnp.where((s1.n_done >= 1) & pre_live, 4, bucket)
            if a_edges is not None or s_edges is not None:
                a_idx = 0
                if a_edges is not None:
                    a_idx = jnp.sum(
                        jnp.abs(pre_att)[:, None]
                        >= jnp.asarray(a_edges)[None, :], axis=1)
                s_idx = 0
                if s_edges is not None:
                    s_idx = jnp.sum(t >= jnp.asarray(s_edges))
                bucket = bucket * (NA * NS) + a_idx * NS + s_idx
            live_f = pre_live.astype(jnp.float32)
            sums = jnp.zeros((NB,)).at[bucket].add(jnp.where(pre_live, inc, 0.0))
            sqs = jnp.zeros((NB,)).at[bucket].add(
                jnp.where(pre_live, inc * inc, 0.0))
            cns = jnp.zeros((NB,)).at[bucket].add(live_f)
            return s1, (sums, sqs, cns)

        _, (sums, sqs, cns) = jax.lax.scan(body, st, jnp.arange(n_steps))
        return sums.sum(0), sqs.sum(0), cns.sum(0)

    run_j = jax.jit(run)
    per_seed = []
    tot = np.zeros((3, NB), np.float64)
    for k in range(n_seeds):
        key = jax.random.PRNGKey((seed0 + k) * 7919 + 13)
        sm, sq, cn = run_j(key)
        sm = np.asarray(sm, np.float64)
        cn = np.asarray(cn, np.float64)
        per_seed.append(sm / np.maximum(cn, 1.0))
        tot += [sm, np.asarray(sq, np.float64), cn]
    per_seed = np.stack(per_seed)
    mean = tot[0] / np.maximum(tot[2], 1.0)
    if n_seeds > 1:
        sem = per_seed.std(0, ddof=1) / np.sqrt(n_seeds)
    else:  # single seed: fall back to the iid SEM
        var = np.maximum(tot[1] / np.maximum(tot[2], 1.0) - mean**2, 0.0)
        sem = np.sqrt(var / np.maximum(tot[2], 1.0))
    return MartingaleReport(
        bucket_names=names,
        mean=mean,
        sem=sem,
        visits_per_walk=tot[2] / (W * n_seeds),
        n=tot[2],
    )
