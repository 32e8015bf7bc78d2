"""SoA walker state for the batched Walk-on-Stars loop.

TPU-native replacement for the reference's per-walk Python locals
(``solvers/WoStSolver.py:188-195``): every scalar the interpreted loop kept
per walk becomes a ``(W,)`` lane of a structure-of-arrays pytree carried
through ``lax.while_loop``. Walker *slots* are recycled: each slot owns a
quota of walks for one evaluation point and immediately starts its next
walk when one terminates, keeping VPU occupancy high despite the heavy
tail of the walk-length distribution (SURVEY.md §7 hard part 3).
"""

from typing import NamedTuple, Optional

import jax.numpy as jnp

__all__ = ["WalkerState", "ChordRequest", "init_state"]


class ChordRequest(NamedTuple):
    """Per-lane buffer of ONE pending Robin residual-chord clone-pair
    request (``robin_correction="residual"``, THEORY.md §4e).

    An on-boundary visit that draws the residual branch stores its chord
    geometry here; the periodic split sweep services it by cloning an
    antithetic walker PAIR into two idle lanes of the same point group
    (+walk from the chord point ``z``, −walk from ``x``, one shared fresh
    RNG stream so the difference walks cancel). ``w == 0`` means empty.
    A lane whose buffer is occupied realizes further visits with the
    unbiased chain fallback, so one slot per lane loses nothing.
    """

    xx: jnp.ndarray   # f32 on-boundary position x at request time
    xy: jnp.ndarray   # f32
    nx: jnp.ndarray   # f32 wall normal at request time
    ny: jnp.ndarray   # f32
    zeta: jnp.ndarray  # f32 signed chord offset along the wall tangent
    w: jnp.ndarray    # f32 leg-A weight, gamma at the CHORD point z
                      #     (0 = no pending request)
    wb: jnp.ndarray   # f32 leg-B weight magnitude, gamma at the walker x.
                      #     The legs need DIFFERENT gammas: the pair
                      #     estimates int 2 gamma(z) G_s u~(z) dzeta
                      #     - c(gamma_x) u~(x), so leg A carries gamma(z)
                      #     and leg B gamma(x); sharing one weight biases
                      #     wherever gamma varies along the wall.


class WalkerState(NamedTuple):
    """All arrays have shape ``(W,)`` unless noted.

    Accumulators (``walk_acc``, ``acc_sum``, ``acc_sumsq``) carry a leading
    source axis ``(n_src, W)``: walk *paths* are independent of the source
    term (they depend only on geometry and coefficients), so one walker
    ensemble estimates the solution for many source fields simultaneously —
    each source costs only one extra field evaluation per step, not a new
    ensemble. The single-source case is ``n_src = 1``.
    """

    px: jnp.ndarray          # f32 current walker position x
    py: jnp.ndarray          # f32 current walker position y
    on_bdry: jnp.ndarray     # bool standing on the Neumann boundary
    nx: jnp.ndarray          # f32 inward normal at the last Neumann hit
    ny: jnp.ndarray          # f32
    atten: jnp.ndarray       # f32 delta-tracking attenuation (1.0 otherwise)
    walk_acc: jnp.ndarray    # f32 (n_src, W) source contributions, this walk
    quota: jnp.ndarray       # i32 walks left for this slot (incl. current)
    steps_cur: jnp.ndarray   # i32 steps taken in the current walk
    acc_sum: jnp.ndarray     # f32 (n_src, W) sum of finished-walk totals
    acc_sumsq: jnp.ndarray   # f32 (n_src, W) sum of squared totals
    n_done: jnp.ndarray      # i32 finished walks
    total_steps: jnp.ndarray  # () f32 active walker-steps taken (diagnostic)
    step_idx: jnp.ndarray    # () i32 global loop iteration (RNG counter)
    trunc_n: jnp.ndarray     # () f32 walks ended by the max_steps cap with
                             #     nonzero weight (roulette kills excluded —
                             #     they end with atten == 0 by design)
    trunc_absw: jnp.ndarray  # () f32 sum of |atten| those walks carried:
                             #     the magnitude of the estimate mass the
                             #     cap silently dropped. The truncation
                             #     bias is -E[atten*(u - bc)(x_T)], so a
                             #     large value relative to n_walks flags a
                             #     max_steps too small for the problem
                             #     (failure detection, SURVEY §2 A3).
    chord: Optional[ChordRequest] = None  # residual-Robin request buffer;
                                          # None (an empty pytree node)
                                          # unless the solve runs
                                          # robin_correction="residual",
                                          # so other configs carry no
                                          # extra state through the loop
    a_cur: Optional[jnp.ndarray] = None   # f32 cached alpha at the CURRENT
                                          # position (delta tracking only).
                                          # Every move's destination alpha
                                          # is already evaluated in-step
                                          # (a_s / a_h / a_z), so carrying
                                          # it saves the walker-position
                                          # re-eval next step — the single
                                          # avoidable field eval of the
                                          # hot loop. None = recompute
                                          # each step (pre-cache behavior;
                                          # also used by residual mode,
                                          # whose leg-B restarts land at
                                          # buffered positions with no
                                          # cached alpha)


def init_state(p0x, p0y, quotas, n_src: int = 1,
               with_chord: bool = False, a0=None) -> WalkerState:
    """``a0``: per-lane alpha at the start positions — enables the
    cross-step alpha cache (``WalkerState.a_cur``); ``None`` keeps the
    recompute-every-step behavior."""
    w = p0x.shape[0]
    f0 = jnp.zeros((w,), jnp.float32)
    acc0 = jnp.zeros((n_src, w), jnp.float32)
    chord = ChordRequest(xx=f0, xy=f0, nx=f0, ny=f0, zeta=f0, w=f0, wb=f0) \
        if with_chord else None
    return WalkerState(
        a_cur=None if a0 is None else jnp.asarray(a0, jnp.float32),
        chord=chord,
        px=p0x.astype(jnp.float32),
        py=p0y.astype(jnp.float32),
        on_bdry=jnp.zeros((w,), bool),
        nx=f0,
        ny=f0,
        atten=jnp.ones((w,), jnp.float32),
        walk_acc=acc0,
        quota=quotas.astype(jnp.int32),
        steps_cur=jnp.zeros((w,), jnp.int32),
        acc_sum=acc0,
        acc_sumsq=acc0,
        n_done=jnp.zeros((w,), jnp.int32),
        total_steps=jnp.zeros((), jnp.float32),
        step_idx=jnp.zeros((), jnp.int32),
        trunc_n=jnp.zeros((), jnp.float32),
        trunc_absw=jnp.zeros((), jnp.float32),
    )
