"""In-graph high-weight splitting: the ONE pairing/halving/stream helper.

Unbiased variance control for delta-tracking weight compounding
(THEORY.md §5): every ``SPLIT_EVERY`` steps, a mid-walk lane whose
``|atten|`` exceeds the threshold clones into an idle lane (quota
exhausted) of the SAME evaluation point; original and clone continue at
half weight with independent RNG streams, and the clone retires after
finishing this one walk (quota exactly 1, ``walk_acc`` reset so the walk
prefix is counted once, by the original). ``E[sum of halves]`` equals the
unsplit walk exactly.

Both in-graph split sites use this builder — the base XLA solve
(``solver/wost.py::_build_solve_fn_xla``, point-major slot layout:
``lane = point * K + slot``) and the sharded XLA solve
(``parallel/mesh.py::_sharded_split_loop``, slot-major:
``lane = slot * n_points + point``). They were previously two transposed
copies marked KEEP IN LOCKSTEP; the layouts now differ only in the
``slot_major`` flag, which picks the (point, slot) view of the flat lane
axis. Pairing always happens within a point's slot group, so point
identity stays positional and the accumulator reshape stays valid with no
per-lane point-id array.

Stream allocation: clone ids are handed out from ``nsid`` upward in
point-group order (rank-in-group + group offset), and ``nsid`` advances by
the ACTUAL clone count — uint32 wraparound stays out of reach for any
realistic solve. Callers start ``nsid`` at ``2**30`` (above all lane/CRN
ids); the sharded path additionally offsets per device.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["SPLIT_EVERY", "make_ingraph_split", "run_split_while",
           "make_launch_split", "LAUNCH_SPLIT_COPY", "reserve_quota_row"]


def reserve_quota_row(n_walks: int, K: int, frac: float):
    """Distribute ``n_walks`` over ``K`` slots leaving ~``frac`` idle.

    The split (both the in-graph 16-step sweep and the Pallas
    launch-boundary pass) can only clone a heavy lane into an IDLE lane
    of the same point group — with every lane active at solve start, the
    EARLY heavy walks (exactly when weights first compound) escape
    splitting entirely (measured: banked |walk| 6e5 with
    ``split_threshold=4`` on the cylinder gate). Reserving a strided
    subset of slots as quota-0 clone hosts makes the split live from
    step one; the hosts recycle (a clone runs its single walk, then the
    lane is idle again). Striding (every ``round(1/frac)``-th slot)
    keeps work AND clone capacity balanced per device under the
    slot-major sharded layout.

    Exactness: the walks are simply redistributed over fewer lanes —
    per-lane RNG streams are lane-keyed, so this changes WHICH walks run
    where (like any target_slots change) but not the estimator.
    """
    import numpy as np

    quota = np.zeros((K,), np.int32)
    if frac <= 0.0 or K < 2:
        work_idx = np.arange(K)
    else:
        stride = max(2, int(round(1.0 / frac)))
        idle = (np.arange(K) % stride) == (stride - 1)
        work_idx = np.flatnonzero(~idle)
    base, rem = divmod(int(n_walks), len(work_idx))
    quota[work_idx] = base
    quota[work_idx[:rem]] += 1
    return quota

SPLIT_EVERY = 16  # steps between split sweeps: bounds weight compounding
                  # at 16 steps of (1 - sigma'/sigma_bar) growth


def make_ingraph_split(threshold: float, n_points: int, n_slots: int,
                       slot_major: bool):
    """Build ``do_split(state, sid, nsid) -> (state, sid, nsid)``.

    Args:
        threshold: ``|atten|`` above which an active lane is split.
        n_points: evaluation-point groups (pairing never crosses one).
        n_slots: walker slots per point group.
        slot_major: lane layout — ``False`` for ``point * n_slots + slot``
            (base solver), ``True`` for ``slot * n_points + point``
            (sharded shards).
    """
    thr = float(threshold)
    rows_idx = jnp.arange(n_points)[:, None]
    col_idx = jnp.arange(n_slots)[None, :]

    if slot_major:
        def view(v):
            return v.reshape(n_slots, n_points).T

        def unview(m):
            return m.T.reshape(-1)
    else:
        def view(v):
            return v.reshape(n_points, n_slots)

        def unview(m):
            return m.reshape(-1)

    def do_split(s, sid, nsid):
        act = view(s.quota > 0)
        heavy = act & (view(jnp.abs(s.atten)) > thr)
        idle = ~act
        src = jnp.argsort(~heavy, axis=1, stable=True)  # heavy slots first
        dst = jnp.argsort(~idle, axis=1, stable=True)   # idle slots first
        n = jnp.minimum(heavy.sum(1), idle.sum(1))      # per point group
        do = col_idx < n[:, None]

        def pair_copy(v):
            m = view(v)
            return unview(m.at[rows_idx, dst].set(
                jnp.where(do, m[rows_idx, src], m[rows_idx, dst])))

        is_src = unview(
            jnp.zeros((n_points, n_slots), bool).at[rows_idx, src].set(do))
        is_dst = unview(
            jnp.zeros((n_points, n_slots), bool).at[rows_idx, dst].set(do))
        halve = is_src | is_dst
        att_p = pair_copy(s.atten)
        atten = jnp.where(halve, att_p * 0.5, att_p)
        # clone accumulates only the walk's remainder, counted once
        wacc = jnp.where(is_dst[None, :], 0.0, s.walk_acc)
        # fresh, unique streams: rank-in-group + group offset, advancing
        # nsid by the actual clone count
        clone_rank = jnp.cumsum(n) - n  # clones in earlier point groups
        rank = (clone_rank[:, None] + col_idx).astype(jnp.uint32)
        fresh = unview(nsid + jnp.zeros(
            (n_points, n_slots), jnp.uint32).at[rows_idx, dst].set(rank))
        new = s._replace(
            px=pair_copy(s.px), py=pair_copy(s.py),
            on_bdry=pair_copy(s.on_bdry),
            nx=pair_copy(s.nx), ny=pair_copy(s.ny),
            atten=atten, walk_acc=wacc,
            steps_cur=pair_copy(s.steps_cur),
            n_done=pair_copy(s.n_done),
            quota=jnp.where(is_dst, 1, s.quota),
            # the clone inherits its source's position, so also its
            # cached alpha (cross-step alpha cache; None when disabled)
            a_cur=None if s.a_cur is None else pair_copy(s.a_cur),
        )
        sid = jnp.where(is_dst, fresh, sid)
        return new, sid, nsid + n.sum().astype(jnp.uint32)

    return do_split


# per-walk state a launch-boundary split clone copies; accumulators
# (asum/asq/life) are NOT copied — the destination lane's finished-walk
# statistics are banked under their OLD point id first — and acc
# (walk_acc) starts at 0 on the clone so the walk prefix is counted once,
# by the original
LAUNCH_SPLIT_COPY = ["p0x", "p0y", "px", "py", "nx", "ny", "ob",
                     "steps", "ndone", "atten",
                     # boundary_snap start constants (present only when
                     # snap_starts is on; clones never recycle — quota 1 —
                     # but copying keeps their lane state self-consistent)
                     "ob0", "n0x", "n0y"]


def make_launch_split(threshold: float, n_src: int, n_points: int):
    """Build the launch-boundary split for the Pallas dict state:
    ``split(state, pid, sid_base) -> (state, pid, n, dsum, dsq)``.

    Pairs heavy/idle lanes GLOBALLY across the whole (rows, 128) state
    (unlike the in-graph split's per-point-block pairing): the Pallas
    layouts carry an explicit per-lane point id, so a drained point-A
    lane can host a point-B clone as long as the destination lane's
    finished-walk statistics are banked under A first (returned as
    ``dsum``/``dsq`` (n_src, n_points) for the caller's carry). Fresh
    stream ids are ``sid_base + lane-rank``; the caller advances its base
    by ``n`` (the actual clone count). Used by the Pallas host launch
    loop (``solver/wost.py``) and, jitted in-graph, by the sharded Pallas
    path (``parallel/mesh.py``) with per-device ``sid_base`` ranges.

    Shape-polymorphic: re-jitting per state shape (compaction shrinks
    rows) retraces automatically.
    """
    thr = float(threshold)

    def split(state, pid, sid_base):
        shapes = {k: v.shape for k, v in state.items()}
        flat = {k: v.reshape(-1) for k, v in state.items()}
        n_lanes = flat["quota"].shape[0]
        active = flat["quota"] > 0
        heavy = active & (jnp.abs(flat["atten"]) > thr)
        idle = ~active
        src = jnp.argsort(~heavy, stable=True)  # heavy lanes first
        dst = jnp.argsort(~idle, stable=True)   # idle lanes first
        n = jnp.minimum(heavy.sum(), idle.sum())
        do = jnp.arange(n_lanes) < n
        # dst is a permutation of all lanes, so one masked scatter per
        # field rewrites exactly the paired idle lanes
        for key in LAUNCH_SPLIT_COPY:
            if key not in flat:  # optional snap keys
                continue
            v = flat[key]
            flat[key] = v.at[dst].set(jnp.where(do, v[src], v[dst]))
        for i in range(n_src):
            v = flat[f"acc{i}"]
            flat[f"acc{i}"] = v.at[dst].set(jnp.where(do, 0.0, v[dst]))
        is_src = jnp.zeros(n_lanes, bool).at[src].set(do)
        is_dst = jnp.zeros(n_lanes, bool).at[dst].set(do)
        flat["atten"] = jnp.where(
            is_src | is_dst, flat["atten"] * 0.5, flat["atten"])
        # clone runs exactly its current walk to completion
        flat["quota"] = flat["quota"].at[dst].set(
            jnp.where(do, 1, flat["quota"][dst]))
        # fresh, unique RNG stream per clone (collision-free with
        # lane/CRN stream ids, which are < 2^30)
        fresh = sid_base + jnp.arange(n_lanes, dtype=jnp.int32)
        flat["sid"] = flat["sid"].at[dst].set(
            jnp.where(do, fresh, flat["sid"][dst]))
        # BANK the destination lanes' finished-walk statistics under
        # their OLD point id before relabeling
        dsum = jnp.stack([
            jax.ops.segment_sum(
                jnp.where(is_dst, flat[f"asum{i}"], 0.0), pid,
                num_segments=n_points)
            for i in range(n_src)
        ])
        dsq = jnp.stack([
            jax.ops.segment_sum(
                jnp.where(is_dst, flat[f"asq{i}"], 0.0), pid,
                num_segments=n_points)
            for i in range(n_src)
        ])
        for i in range(n_src):
            flat[f"asum{i}"] = jnp.where(is_dst, 0.0, flat[f"asum{i}"])
            flat[f"asq{i}"] = jnp.where(is_dst, 0.0, flat[f"asq{i}"])
        pid = pid.at[dst].set(jnp.where(do, pid[src], pid[dst]))
        new_state = {k: v.reshape(shapes[k]) for k, v in flat.items()}
        return new_state, pid, n, dsum, dsq

    return split


def run_split_while(step, do_split, state, p0x, p0y, key, sid0, nsid0,
                    step_cap: int, max_steps: int):
    """The sweep-enabled while-loop the in-graph split solve paths share.

    ``step_cap`` bounds ORIGINAL walks (``quota * (max_steps + 1)``); a
    clone created near it needs up to ``max_steps`` more iterations, so
    splits stop at ``step_cap`` and the loop runs ``max_steps + 2``
    longer — every clone (and clone-of-clone: splits only occur below
    ``step_cap``) provably finishes, keeping the split exactly unbiased
    instead of truncating late clones' half-weights.
    """
    split_cap = step_cap + max_steps + 2

    def cond(c):
        s = c[0]
        return (s.step_idx < split_cap) & jnp.any(s.quota > 0)

    def sweep(s, sid, nsid):
        return jax.lax.cond(
            s.step_idx < step_cap,
            do_split,
            lambda a, b, c_: (a, b, c_),
            s, sid, nsid,
        )

    def body(c):
        s, sid, nsid = c
        s2, _ = step(s, p0x, p0y, key, sid=sid)
        return jax.lax.cond(
            s2.step_idx % SPLIT_EVERY == 0,
            sweep,
            lambda a, b, c_: (a, b, c_),
            s2, sid, nsid,
        )

    final, _, _ = jax.lax.while_loop(cond, body, (state, sid0, nsid0))
    return final
