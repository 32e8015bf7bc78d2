"""Fused Pallas walk kernel — the TPU fast path for the WoSt solver.

Why this exists (measured on v5e): the XLA `lax.while_loop` solver pays a
~60-85 us **per-iteration** dispatch floor plus a full HBM round trip of
the walker state every step, and XLA's threefry inside a while-loop costs
minutes of compile time. This kernel instead:

* keeps the entire SoA walker state **resident in VMEM** across
  ``n_inner`` (default 256) walk steps per launch — HBM sees the state
  once per launch instead of once per step;
* tiles walkers over the Pallas grid ``(W / block, )`` with double-buffered
  DMA between blocks;
* uses the on-core ``pltpu.prng_random_bits`` generator (one seed per
  block x launch) instead of threefry;
* **unrolls the polyline geometry statically**: segment endpoints and
  interior-vertex triples are baked into the kernel as scalar constants
  (the boundary is static problem data), so the per-step closest-point /
  silhouette / first-hit queries are pure register arithmetic — the Pallas
  realization of the "segment arrays resident in VMEM" plan (SURVEY.md §2,
  TPU-native equivalents table);
* runs the same branchless step semantics as
  ``solver/wost.py::_make_step_core`` (termination + recycle, star radius,
  hemisphere direction, first hit, source NEE, delta-tracking move), and
  the same two-regime **exact screened-radius rejection sampler** as
  ``sampling/radial.py::sample_screened_radius_exact`` with a fixed
  unrolled redraw budget.

The Pallas path currently supports boundaries up to ``MAX_UNROLL_SEGMENTS``
segments (covers every reference scenario; larger geometry falls back to
the XLA path, which handles arbitrary S).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["make_pallas_walk", "pallas_supported", "MAX_UNROLL_SEGMENTS"]

MAX_UNROLL_SEGMENTS = 96   # static register unroll above this -> SMEM loop
MAX_SMEM_SEGMENTS = 8192   # SMEM geometry table budget
_LANES = 128
_TWO_PI = 2.0 * np.pi


def _geometry_size(problem):
    n_seg = problem.dirichlet.num_segments
    n_vert = 0
    if problem.neumann is not None:
        n_seg += problem.neumann.num_segments
        n_vert = int(np.asarray(problem.neumann.vert_valid).sum())
    return n_seg + n_vert


def pallas_supported(problem) -> bool:
    """Small boundaries unroll into registers; larger ones loop over an
    SMEM-resident segment table (up to ``MAX_SMEM_SEGMENTS``)."""
    return _geometry_size(problem) <= MAX_SMEM_SEGMENTS


def _static_segments(poly):
    """Extract segment endpoints as python-float tuples (static constants)."""
    a = np.asarray(poly.seg_a)[np.asarray(poly.seg_valid)]
    b = np.asarray(poly.seg_b)[np.asarray(poly.seg_valid)]
    return [
        (float(a[i, 0]), float(a[i, 1]), float(b[i, 0]), float(b[i, 1]))
        for i in range(len(a))
    ]


def _static_vertices(poly):
    abc = np.asarray(poly.vert_abc)[np.asarray(poly.vert_valid)]
    return [tuple(float(v) for v in abc[i].ravel()) for i in range(len(abc))]


def _false_like(x):
    # all-False mask without materializing a bool constant (Mosaic cannot
    # lower the i8->i1 truncation that jnp.zeros(shape, bool) produces)
    return x > jnp.float32(3.0e38)


def _uniform(shape):
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    # keep 24 mantissa bits; bitcast to int32 (positive) because Mosaic has
    # no uint32->f32 cast
    mant = pltpu.bitcast(bits >> jnp.uint32(8), jnp.int32)
    return mant.astype(jnp.float32) * jnp.float32(2.0**-24)


def _closest_point_unrolled(segs, px, py):
    big = jnp.float32(3e38)
    best = jnp.full_like(px, big)
    bcx = jnp.zeros_like(px)
    bcy = jnp.zeros_like(px)
    for (ax, ay, bx, by) in segs:
        ux, uy = bx - ax, by - ay
        uu = max(ux * ux + uy * uy, 1e-30)
        vx = px - ax
        vy = py - ay
        t = jnp.clip((vx * ux + vy * uy) * (1.0 / uu), 0.0, 1.0)
        cx = ax + t * ux
        cy = ay + t * uy
        d2 = (cx - px) ** 2 + (cy - py) ** 2
        pick = d2 < best
        best = jnp.where(pick, d2, best)
        bcx = jnp.where(pick, cx, bcx)
        bcy = jnp.where(pick, cy, bcy)
    return jnp.sqrt(best), bcx, bcy


def _silhouette_unrolled(verts, px, py):
    big = jnp.float32(3e38)
    best = jnp.full_like(px, big)
    for (axv, ayv, bxv, byv, cxv, cyv) in verts:
        abx, aby = bxv - axv, byv - ayv
        bcx_, bcy_ = cxv - bxv, cyv - byv
        apx = px - axv
        apy = py - ayv
        bpx = px - bxv
        bpy = py - byv
        s = (abx * apy - aby * apx) * (bcx_ * bpy - bcy_ * bpx)
        d2 = bpx * bpx + bpy * bpy
        best = jnp.where(s < 0, jnp.minimum(best, d2), best)
    return jnp.sqrt(best)


def _first_hit_unrolled(segs, px, py, dx, dy, r, t_min):
    big = jnp.float32(3e38)
    t_best = jnp.full_like(px, big)
    nx = jnp.zeros_like(px)
    ny = jnp.zeros_like(px)
    for (ax, ay, bx, by) in segs:
        ux, uy = bx - ax, by - ay
        ulen = max(float(np.hypot(ux, uy)), 1e-30)
        nxs, nys = -uy / ulen, ux / ulen  # static CCW normal
        wx = px - ax
        wy = py - ay
        den = dx * uy - dy * ux
        den_safe = jnp.where(jnp.abs(den) < 1e-30, 1e-30, den)
        inv_den = 1.0 / den_safe
        t = (ux * wy - uy * wx) * inv_den
        s = (dx * wy - dy * wx) * inv_den
        ok = (s >= 0.0) & (s <= 1.0) & (t > t_min) & (jnp.abs(den) > 1e-30)
        t = jnp.where(ok, t, big)
        pick = t < t_best
        t_best = jnp.where(pick, t, t_best)
        nx = jnp.where(pick, nxs, nx)
        ny = jnp.where(pick, nys, ny)
    hit = t_best <= r
    t_hit = jnp.where(hit, t_best, r)
    # orient against the ray (inward)
    flip = (nx * dx + ny * dy) > 0.0
    nx = jnp.where(flip, -nx, nx)
    ny = jnp.where(flip, -ny, ny)
    nx = jnp.where(hit, nx, 0.0)
    ny = jnp.where(hit, ny, 0.0)
    return px + t_hit * dx, py + t_hit * dy, nx, ny, t_hit, hit


_CHUNK = 32  # SMEM geometry loop unroll factor


def _closest_point_smem(seg_ref, n_seg_pad, px, py):
    """Closest point over an SMEM-resident ``(S, 4)`` segment table.

    fori over chunks of ``_CHUNK`` statically-unrolled segments: dynamic
    scalar SMEM reads are cheap, but one fori iteration per segment costs
    ~us of loop overhead — the unroll amortizes it 8x. Padding segments
    are degenerate points at 1e30 and lose every min.
    """
    big = jnp.float32(3e38)

    def chunk(c, carry):
        best, bcx, bcy = carry
        for j in range(_CHUNK):
            i = c * _CHUNK + j
            ax = seg_ref[i, 0]
            ay = seg_ref[i, 1]
            ux = seg_ref[i, 2] - ax
            uy = seg_ref[i, 3] - ay
            uu = jnp.maximum(ux * ux + uy * uy, 1e-30)
            vx = px - ax
            vy = py - ay
            t = jnp.clip((vx * ux + vy * uy) * (1.0 / uu), 0.0, 1.0)
            cx = ax + t * ux
            cy = ay + t * uy
            d2 = (cx - px) ** 2 + (cy - py) ** 2
            pick = d2 < best
            best = jnp.where(pick, d2, best)
            bcx = jnp.where(pick, cx, bcx)
            bcy = jnp.where(pick, cy, bcy)
        return best, bcx, bcy

    init = (jnp.full_like(px, big), jnp.zeros_like(px), jnp.zeros_like(px))
    best, bcx, bcy = jax.lax.fori_loop(0, n_seg_pad // _CHUNK, chunk, init)
    return jnp.sqrt(best), bcx, bcy


def _silhouette_smem(vert_ref, n_vert_pad, px, py):
    big = jnp.float32(3e38)

    def chunk(c, best):
        for j in range(_CHUNK):
            i = c * _CHUNK + j
            axv = vert_ref[i, 0]
            ayv = vert_ref[i, 1]
            bxv = vert_ref[i, 2]
            byv = vert_ref[i, 3]
            cxv = vert_ref[i, 4]
            cyv = vert_ref[i, 5]
            abx, aby = bxv - axv, byv - ayv
            bcx_, bcy_ = cxv - bxv, cyv - byv
            apx = px - axv
            apy = py - ayv
            bpx = px - bxv
            bpy = py - byv
            sgn = (abx * apy - aby * apx) * (bcx_ * bpy - bcy_ * bpx)
            d2 = bpx * bpx + bpy * bpy
            best = jnp.where(sgn < 0, jnp.minimum(best, d2), best)
        return best

    best = jax.lax.fori_loop(0, n_vert_pad // _CHUNK, chunk,
                             jnp.full_like(px, big))
    return jnp.sqrt(best)


def _first_hit_smem(seg_ref, n_seg_pad, px, py, dx, dy, r, t_min):
    big = jnp.float32(3e38)

    def chunk(c, carry):
        t_best, nx, ny = carry
        for j in range(_CHUNK):
            i = c * _CHUNK + j
            ax = seg_ref[i, 0]
            ay = seg_ref[i, 1]
            ux = seg_ref[i, 2] - ax
            uy = seg_ref[i, 3] - ay
            ulen = jnp.sqrt(jnp.maximum(ux * ux + uy * uy, 1e-30))
            nxs, nys = -uy / ulen, ux / ulen
            wx = px - ax
            wy = py - ay
            den = dx * uy - dy * ux
            den_safe = jnp.where(jnp.abs(den) < 1e-30, 1e-30, den)
            inv_den = 1.0 / den_safe
            t = (ux * wy - uy * wx) * inv_den
            sp = (dx * wy - dy * wx) * inv_den
            ok = (sp >= 0.0) & (sp <= 1.0) & (t > t_min) & (jnp.abs(den) > 1e-30)
            t = jnp.where(ok, t, big)
            pick = t < t_best
            t_best = jnp.where(pick, t, t_best)
            nx = jnp.where(pick, nxs, nx)
            ny = jnp.where(pick, nys, ny)
        return t_best, nx, ny

    init = (jnp.full_like(px, big), jnp.zeros_like(px), jnp.zeros_like(px))
    t_best, nx, ny = jax.lax.fori_loop(0, n_seg_pad // _CHUNK, chunk, init)
    hit = t_best <= r
    t_hit = jnp.where(hit, t_best, r)
    flip = (nx * dx + ny * dy) > 0.0
    nx = jnp.where(flip, -nx, nx)
    ny = jnp.where(flip, -ny, ny)
    nx = jnp.where(hit, nx, 0.0)
    ny = jnp.where(hit, ny, 0.0)
    return px + t_hit * dx, py + t_hit * dy, nx, ny, t_hit, hit


def _pad_chunk(table):
    """Pad an SMEM table to a multiple of ``_CHUNK`` rows with degenerate
    1e30 rows (same convention as Polyline's own padding: they lose every
    min and fail every hit test). The chunk loops iterate ``rows / _CHUNK``
    times, so a table only padded to Polyline's multiple-of-8 would have
    its trailing real rows silently skipped.
    """
    n = len(table)
    n_pad = ((n + _CHUNK - 1) // _CHUNK) * _CHUNK
    if n_pad == n:
        return table
    out = np.full((n_pad, table.shape[1]), 1e30, np.float32)
    out[:n] = table
    return out


def _seg_table(poly):
    """(S_pad, 4) float32 [ax, ay, bx, by] incl. degenerate padding rows."""
    a = np.asarray(poly.seg_a, np.float32)
    b = np.asarray(poly.seg_b, np.float32)
    return _pad_chunk(np.concatenate([a, b], axis=1))


def _vert_table(poly):
    """(V_pad, 6) float32 [a, b, c] triples incl. padding rows."""
    return _pad_chunk(
        np.asarray(poly.vert_abc, np.float32).reshape(len(poly.vert_abc), 6)
    )


# ---------------------------------------------------------------------- #
# Bessel + screened sampling (same math as ops/bessel.py and              #
# sampling/radial.py, restated on register arrays)                        #
# ---------------------------------------------------------------------- #

def _i0e(x):
    from .bessel import i0e

    return i0e(x)


def _k0e(x):
    from .bessel import k0e

    return k0e(x)


def _one_minus_inv_i0(z):
    # cancellation-safe 1 - 1/I0(z); see ops/greens.py::_one_minus_inv_i0
    t = z * z * 0.25
    s = t * (1.0 + t * (0.25 + t / 36.0))
    small = s / (1.0 + s)
    large = 1.0 - jnp.exp(-z) / _i0e(jnp.maximum(z, 0.25))
    return jnp.where(z < 0.25, small, large)


def _screened_interior_prob(r, sigma_bar):
    z = r * float(np.sqrt(sigma_bar))
    return _one_minus_inv_i0(z)


def _screened_norm(r, sigma_bar):
    z = r * float(np.sqrt(sigma_bar))
    return _one_minus_inv_i0(z) / float(sigma_bar)


def _sample_screened_exact(r, sigma_bar, n_rounds):
    """Two-regime rejection (see sample_screened_radius_exact) as an
    in-kernel while-loop with early exit: redraw rounds stop as soon as
    every lane has accepted (acceptance is >=0.56 worst-case and >0.9 in
    the deep-screening regime, so typical kernels run 2-6 rounds instead
    of a fixed unroll). ``n_rounds`` caps the loop; lanes still rejected
    at the cap keep their last envelope candidate (< 0.44^n_rounds of
    draws).
    """
    sq = float(np.sqrt(sigma_bar))
    z = jnp.maximum(r * sq, 1e-12)
    small = z < 2.0
    tiny = z < 1e-3
    k0e_z = _k0e(z)
    i0e_z = _i0e(z)

    def draw_round():
        u = _uniform((4,) + z.shape)
        u0 = jnp.maximum(u[0], 1e-7)
        u1 = jnp.maximum(u[1], 1e-7)
        u2 = jnp.maximum(u[2], 1e-7)
        s_small = jnp.sqrt(u0 * u1)
        x_small = z * s_small
        x_large = -jnp.log(u1 * u2) * jnp.sqrt(
            jnp.maximum(1.0 - u0 * u0, 1e-12))
        x = jnp.where(small, x_small, x_large)
        sc = jnp.where(small, s_small, x_large / z)
        ratio = (k0e_z * _i0e(x)) / (i0e_z * _k0e(x)) * jnp.exp(
            -2.0 * jnp.maximum(z - x, 0.0)
        )
        k0x = _k0e(x) * jnp.exp(-x)
        ln_s = -jnp.log(jnp.clip(sc, 1e-12, 1.0 - 1e-7))
        p_small = jnp.clip(k0x * (1.0 - ratio) / jnp.maximum(ln_s, 1e-12),
                           0.0, 1.0)
        p_large = jnp.where(x <= z, jnp.clip(1.0 - ratio, 0.0, 1.0), 0.0)
        p = jnp.where(small, p_small, p_large)
        return sc, u[3] < p

    s0, ok0 = draw_round()

    def cond(carry):
        i, s_cur, acc_i = carry
        return (i < n_rounds) & jnp.any(acc_i == 0)

    def body(carry):
        i, s_cur, acc_i = carry
        sc, ok = draw_round()
        accepted = acc_i != 0
        take = (~accepted) & ok
        s_cur = jnp.where(take | (~accepted), sc, s_cur)
        acc_i = (accepted | take).astype(jnp.int32)
        return i + 1, s_cur, acc_i

    _, s_cur, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(1), s0, ok0.astype(jnp.int32))
    )
    # unscreened shortcut for tiny z
    u = _uniform((2,) + z.shape)
    s_tiny = jnp.sqrt(jnp.maximum(u[0], 1e-12) * jnp.maximum(u[1], 1e-12))
    s_cur = jnp.where(tiny, s_tiny, s_cur)
    return jnp.clip(s_cur, 0.0, 1.0) * r


class PallasWalkPlan(NamedTuple):
    run: callable      # (points_state..., seeds) -> new state
    block_rows: int
    n_inner: int


def make_pallas_walk(
    problem,
    eps: float,
    max_steps: int,
    t_min: float,
    rmin: float,
    project: bool,
    n_inner: int = 256,
    block_rows: int = 128,
    rejection_rounds: int = 24,
):
    """Build the fused multi-step kernel.

    Returns a jittable ``launch(state_dict, seed) -> state_dict`` advancing
    every walker by ``n_inner`` steps. State arrays are ``(rows, 128)``
    float32/int32 with rows a multiple of ``block_rows``.
    """
    pb = problem
    use_delta = pb.use_delta_tracking
    has_neumann = pb.neumann is not None
    source_fields = pb.source_fields
    has_source = len(source_fields) > 0
    n_src = max(1, len(source_fields))
    sigma_bar = float(pb.sigma_bar) if use_delta else 0.0
    importance = pb.source_importance
    use_mis = has_source and importance is not None
    if use_mis:
        # static mixture constants (unrolled component selection / pdf)
        mis_cx = [float(v) for v in np.asarray(importance.cx)]
        mis_cy = [float(v) for v in np.asarray(importance.cy)]
        mis_w = [float(v) for v in np.asarray(importance.width)]
        mis_a = [float(v) for v in np.asarray(importance.weight)]
        mis_cum = np.cumsum(mis_a).tolist()
    static_geom = _geometry_size(pb) <= MAX_UNROLL_SEGMENTS
    dir_segs = _static_segments(pb.dirichlet) if static_geom else []
    neu_segs = (_static_segments(pb.neumann)
                if has_neumann and static_geom else [])
    neu_verts = (_static_vertices(pb.neumann)
                 if has_neumann and static_geom else [])
    has_verts = (
        bool(neu_verts) if static_geom
        else has_neumann and int(np.asarray(pb.neumann.vert_valid).sum()) > 0
    )
    if not static_geom:
        dir_table = jnp.asarray(_seg_table(pb.dirichlet))
        neu_table = jnp.asarray(_seg_table(pb.neumann)) if has_neumann else None
        vert_table = jnp.asarray(_vert_table(pb.neumann)) if has_verts else None
        geom_inputs = [dir_table] + (
            [neu_table] if has_neumann else []
        ) + ([vert_table] if has_verts else [])
    else:
        geom_inputs = []
    n_geom = len(geom_inputs)

    def _lift2d(f):
        # scalar fields (incl. jax.grad-built sigma', which requires scalar
        # tracing) applied to (rows, 128) register arrays via double vmap
        return jax.vmap(jax.vmap(
            lambda x, y: jnp.asarray(f(x, y), jnp.float32) + 0.0 * x
        ))

    bc = _lift2d(pb.bc_dirichlet)
    sources = [_lift2d(f) for f in source_fields]
    alpha_c = _lift2d(pb.alpha_c) if use_delta else None
    sigma_prime = _lift2d(pb.sigma_prime) if use_delta else None
    # python-float constants (pallas kernels may not capture array consts)
    eps_f = float(eps)
    rmin_f = float(rmin)
    t_min_f = float(t_min)

    def kernel(*refs):
        seed_ref = refs[0]
        gi = 1
        if not static_geom:
            dir_seg_ref = refs[gi]
            gi += 1
            if has_neumann:
                neu_seg_ref = refs[gi]
                gi += 1
            if has_verts:
                neu_vert_ref = refs[gi]
                gi += 1
        p0x_ref, p0y_ref = refs[gi], refs[gi + 1]
        n_state = 5 + 3 * n_src + 5
        sin = refs[gi + 2: gi + 2 + n_state]
        sout = refs[gi + 2 + n_state: gi + 2 + 2 * n_state]
        (px_ref, py_ref, nx_ref, ny_ref, atten_ref) = sin[:5]
        acc_refs = sin[5: 5 + n_src]
        asum_refs = sin[5 + n_src: 5 + 2 * n_src]
        asq_refs = sin[5 + 2 * n_src: 5 + 3 * n_src]
        (quota_ref, steps_ref, ndone_ref, ob_ref, life_ref) = sin[5 + 3 * n_src:]
        (opx_ref, opy_ref, onx_ref, ony_ref, oatten_ref) = sout[:5]
        oacc_refs = sout[5: 5 + n_src]
        oasum_refs = sout[5 + n_src: 5 + 2 * n_src]
        oasq_refs = sout[5 + 2 * n_src: 5 + 3 * n_src]
        (oquota_ref, osteps_ref, ondone_ref, oob_ref, olife_ref) = \
            sout[5 + 3 * n_src:]

        if static_geom:
            closest_point = lambda px, py: _closest_point_unrolled(
                dir_segs, px, py)
            silhouette = lambda px, py: _silhouette_unrolled(
                neu_verts, px, py)
            first_hit = lambda px, py, dx, dy, r: _first_hit_unrolled(
                neu_segs, px, py, dx, dy, r, t_min_f)
        else:
            n_dir = dir_table.shape[0]
            closest_point = lambda px, py: _closest_point_smem(
                dir_seg_ref, n_dir, px, py)
            if has_verts:
                n_vert = vert_table.shape[0]
                silhouette = lambda px, py: _silhouette_smem(
                    neu_vert_ref, n_vert, px, py)
            if has_neumann:
                n_neu = neu_table.shape[0]
                first_hit = lambda px, py, dx, dy, r: _first_hit_smem(
                    neu_seg_ref, n_neu, px, py, dx, dy, r, t_min_f)

        # scramble (seed, block) so sequential launch seeds and block ids
        # land in well-separated PRNG streams
        pltpu.prng_seed(
            seed_ref[0] * jnp.int32(-1640531527)  # golden-ratio odd const
            + pl.program_id(0) * jnp.int32(0x68E31DA4)
        )
        p0x = p0x_ref[:]
        p0y = p0y_ref[:]

        def step(_, carry):
            (px, py, nxv, nyv, atten, accs, asums, asqs, quota, steps,
             ndone, obi, life) = carry
            accs, asums, asqs = list(accs), list(asums), list(asqs)
            # masks are carried as int32: Mosaic cannot round-trip i1
            # vectors through loop carries (trunci i8->i1 unsupported)
            ob = obi != 0
            act = quota > 0

            dD, cx, cy = closest_point(px, py)
            done_eps = dD <= eps_f
            walk_done = act & (done_eps | (steps >= max_steps))
            if project:
                bx = jnp.where(done_eps, cx, px)
                by = jnp.where(done_eps, cy, py)
            else:
                bx, by = px, py
            g_bc = bc(bx, by) * atten
            wd = walk_done.astype(jnp.float32)
            for i in range(n_src):
                contrib = accs[i] + g_bc
                asums[i] = asums[i] + wd * contrib
                asqs[i] = asqs[i] + wd * contrib * contrib
            ndone = ndone + walk_done.astype(jnp.int32)
            quota = quota - walk_done.astype(jnp.int32)

            px = jnp.where(walk_done, p0x, px)
            py = jnp.where(walk_done, p0y, py)
            for i in range(n_src):
                accs[i] = jnp.where(walk_done, 0.0, accs[i])
            atten = jnp.where(walk_done, 1.0, atten)
            ob = ob & ~walk_done
            steps = jnp.where(walk_done, 0, steps)
            stepping = act & ~walk_done

            if has_neumann and has_verts:
                d_sil = silhouette(px, py)
                r = jnp.maximum(rmin_f, jnp.minimum(dD, d_sil))
            else:
                r = jnp.maximum(rmin_f, dD)

            u = _uniform((2,) + px.shape)
            theta = float(_TWO_PI) * u[0]
            dx = jnp.cos(theta)
            dy = jnp.sin(theta)
            if has_neumann:
                # inward-normal-centered hemisphere without atan2: rotate
                # the normal by beta = pi (u - 1/2); cos(beta) = sin(pi u),
                # sin(beta) = -cos(pi u)
                cb = jnp.sin(float(np.pi) * u[0])
                sb = -jnp.cos(float(np.pi) * u[0])
                hdx = nxv * cb - nyv * sb
                hdy = nyv * cb + nxv * sb
                dx = jnp.where(ob, hdx, dx)
                dy = jnp.where(ob, hdy, dy)

            if has_neumann:
                hx, hy, hnx, hny, t_hit, hit = first_hit(px, py, dx, dy, r)
            else:
                hx = px + r * dx
                hy = py + r * dy
                hnx = jnp.zeros_like(px)
                hny = jnp.zeros_like(px)
                t_hit = r
                hit = _false_like(px)

            if use_delta:
                r_s = _sample_screened_exact(r, sigma_bar, rejection_rounds)
            else:
                r_s = r * jnp.sqrt(jnp.maximum(u[1], 1e-12)
                                   * jnp.maximum(_uniform(px.shape), 1e-12))
            beyond = r_s > t_hit
            sx = jnp.where(beyond, hx, px + r_s * dx)
            sy = jnp.where(beyond, hy, py + r_s * dy)

            if use_delta:
                a_p = alpha_c(px, py)
                a_s = alpha_c(sx, sy)

            if has_source and not use_mis:
                if use_delta:
                    w_src = (_screened_norm(r, sigma_bar)
                             / jnp.sqrt(a_s * a_p) * atten)
                else:
                    w_src = r * r * 0.25
                # one shared NEE sample, one field eval per source
                w_eff = jnp.where(stepping & ~beyond, w_src, 0.0)
                for i in range(n_src):
                    accs[i] = accs[i] + sources[i](sx, sy) * w_eff
            elif use_mis:
                # source-directed MIS NEE (see solver/wost.py): sample from
                # 0.5 * ball-Green's + 0.5 * static Gaussian mixture
                um = _uniform((4,) + px.shape)
                take_src = um[0] < 0.5
                # unrolled component pick + Box-Muller offset
                mx = jnp.full_like(px, mis_cx[-1])
                my = jnp.full_like(px, mis_cy[-1])
                mw = jnp.full_like(px, mis_w[-1])
                for ci in range(len(mis_cx) - 2, -1, -1):
                    pick_c = um[1] < mis_cum[ci]
                    mx = jnp.where(pick_c, mis_cx[ci], mx)
                    my = jnp.where(pick_c, mis_cy[ci], my)
                    mw = jnp.where(pick_c, mis_w[ci], mw)
                rad = jnp.sqrt(-2.0 * jnp.log(jnp.maximum(um[2], 1e-12)))
                ang = float(_TWO_PI) * um[3]
                mx = mx + mw * rad * jnp.cos(ang)
                my = my + mw * rad * jnp.sin(ang)
                gx = px + r_s * dx
                gy = py + r_s * dy
                yx = jnp.where(take_src, mx, gx)
                yy = jnp.where(take_src, my, gy)
                d_y = jnp.sqrt((yx - px) ** 2 + (yy - py) ** 2)
                d_safe = jnp.maximum(d_y, 1e-12)
                if use_delta:
                    sq = float(np.sqrt(sigma_bar))
                    a_arg = d_safe * sq
                    z_arg = r * sq
                    # G = [K0(a) - (K0(z)/I0(z)) I0(a)] / 2pi, scaled-stable
                    g_val = (
                        _k0e(a_arg) * jnp.exp(-a_arg)
                        - (_k0e(z_arg) / _i0e(z_arg)) * _i0e(a_arg)
                        * jnp.exp(a_arg - 2.0 * z_arg)
                    ) / float(_TWO_PI)
                    norm = _screened_norm(r, sigma_bar)
                else:
                    g_val = jnp.log(jnp.maximum(r / d_safe, 1e-12)) \
                        / float(_TWO_PI)
                    norm = r * r * 0.25
                g_val = jnp.maximum(g_val, 0.0)
                in_ball = d_y < r
                if has_neumann:
                    ydx = (yx - px) / d_safe
                    ydy = (yy - py) / d_safe
                    _, _, _, _, t_y, hit_y = first_hit(px, py, ydx, ydy, d_y)
                    in_star = in_ball & ~(hit_y & (t_y < d_y))
                else:
                    in_star = in_ball
                # static-mixture pdf
                q = jnp.zeros_like(px)
                for ci in range(len(mis_cx)):
                    w2 = mis_w[ci] * mis_w[ci]
                    q = q + mis_a[ci] * jnp.exp(
                        -((yx - mis_cx[ci]) ** 2 + (yy - mis_cy[ci]) ** 2)
                        / (2.0 * w2)
                    ) / (float(_TWO_PI) * w2)
                # hemisphere-direction density doubling for on-boundary
                # walkers (see solver/wost.py MIS block)
                m_ob = 1.0 + ob.astype(jnp.float32)
                p_ball = jnp.where(in_ball, m_ob * g_val / norm, 0.0)
                p_mix = 0.5 * p_ball + 0.5 * q
                w_mis = jnp.where(
                    in_star & (p_mix > 1e-30),
                    m_ob * g_val / jnp.maximum(p_mix, 1e-30), 0.0,
                )
                if use_delta:
                    a_y = alpha_c(yx, yy)
                    w_mis = w_mis / jnp.sqrt(a_y * a_p) * atten
                w_mis = jnp.where(stepping, w_mis, 0.0)
                for i in range(n_src):
                    accs[i] = accs[i] + sources[i](yx, yy) * w_mis

            if use_delta:
                p_int = _screened_interior_prob(r, sigma_bar)
                interior = _uniform(px.shape) < p_int
                a_h = alpha_c(hx, hy)
                sp_s = sigma_prime(sx, sy)
                scale_int = jnp.sqrt(a_s / a_p) * jnp.maximum(
                    1.0 - sp_s / float(sigma_bar), 0.0
                )
                scale_edge = jnp.sqrt(a_h / a_p)
                atten = jnp.where(
                    stepping,
                    atten * jnp.where(interior, scale_int, scale_edge),
                    atten,
                )
                newx = jnp.where(interior, sx, hx)
                newy = jnp.where(interior, sy, hy)
                new_ob = hit & ~interior
            else:
                newx, newy = hx, hy
                new_ob = hit

            px = jnp.where(stepping, newx, px)
            py = jnp.where(stepping, newy, py)
            # boolean blends via logical algebra: Mosaic lowers i1-vector
            # selects through an unsupported i8->i1 truncation
            ob = (stepping & new_ob) | (~stepping & ob)
            upd_n = stepping & hit
            nxv = jnp.where(upd_n, hnx, nxv)
            nyv = jnp.where(upd_n, hny, nyv)
            steps = steps + stepping.astype(jnp.int32)
            # per-lane lifetime counter: summed outside the kernel for the
            # walker-steps throughput metric
            life = life + stepping.astype(jnp.int32)
            return (px, py, nxv, nyv, atten, tuple(accs), tuple(asums),
                    tuple(asqs), quota, steps, ndone, ob.astype(jnp.int32),
                    life)

        carry = (
            px_ref[:], py_ref[:], nx_ref[:], ny_ref[:], atten_ref[:],
            tuple(ref[:] for ref in acc_refs),
            tuple(ref[:] for ref in asum_refs),
            tuple(ref[:] for ref in asq_refs),
            quota_ref[:], steps_ref[:], ndone_ref[:], ob_ref[:], life_ref[:],
        )
        carry = jax.lax.fori_loop(0, n_inner, step, carry)
        (px, py, nxv, nyv, atten, accs, asums, asqs, quota, steps, ndone,
         obi, life) = carry
        opx_ref[:] = px
        opy_ref[:] = py
        onx_ref[:] = nxv
        ony_ref[:] = nyv
        oatten_ref[:] = atten
        for i in range(n_src):
            oacc_refs[i][:] = accs[i]
            oasum_refs[i][:] = asums[i]
            oasq_refs[i][:] = asqs[i]
        oquota_ref[:] = quota
        osteps_ref[:] = steps
        ondone_ref[:] = ndone
        oob_ref[:] = obi
        olife_ref[:] = life

    f32 = jnp.float32
    i32 = jnp.int32

    def launch(state, seed):
        """Advance all walkers by ``n_inner`` steps.

        state: dict with keys p0x,p0y (f32), px,py,nx,ny,atten,acc,asum,asq
        (f32), quota,steps,ndone,ob (i32) — all (rows, 128).
        """
        rows = state["px"].shape[0]
        grid = (rows // block_rows,)
        bspec = lambda: pl.BlockSpec(
            (block_rows, _LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
        )
        order = (
            ["px", "py", "nx", "ny", "atten"]
            + [f"acc{i}" for i in range(n_src)]
            + [f"asum{i}" for i in range(n_src)]
            + [f"asq{i}" for i in range(n_src)]
            + ["quota", "steps", "ndone", "ob", "life"]
        )
        dtypes = [f32] * (5 + 3 * n_src) + [i32] * 5
        out_shape = [
            jax.ShapeDtypeStruct((rows, _LANES), dt) for dt in dtypes
        ]
        out_specs = [bspec() for _ in order]
        # alias state inputs (after seed, geometry, p0x, p0y) to outputs
        aliases = {1 + n_geom + 2 + k: k for k in range(len(order))}
        outs = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),  # seed (1,)
            ] + [
                pl.BlockSpec(memory_space=pltpu.SMEM)   # geometry tables
                for _ in range(n_geom)
            ] + [
                bspec(),  # p0x
                bspec(),  # p0y
            ] + [bspec() for _ in order],
            out_shape=out_shape,
            out_specs=out_specs,
            input_output_aliases=aliases,
        )(
            jnp.asarray([seed], i32),
            *geom_inputs,
            state["p0x"], state["p0y"],
            *[state[k] for k in order],
        )
        new_state = dict(state)
        for k, name in enumerate(order):
            new_state[name] = outs[k]
        return new_state

    return PallasWalkPlan(run=launch, block_rows=block_rows, n_inner=n_inner)
