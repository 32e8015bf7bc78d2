"""Geometry query unit tests.

Tier 1: exact-value asserts conceptually ported from the reference's
geometry tests (``geometry/PolylinesSimple.py:309-357``), plus a brute-force
NumPy oracle over random geometry. The first-hit expectations use the TRUE
ray parameter (the reference's ray test at ``PolylinesSimple.py:336-344``
only passes because its geometry makes ray and segment parameters equal).
"""

import numpy as np
import jax.numpy as jnp

from dcrmontecarlo_tpu.geometry import (
    Polyline,
    square_loop,
    circle_loop,
    func_to_polyline,
    distance,
    closest_point,
    is_silhouette,
    silhouette_distance,
    first_hit,
)


def _arr(*vals):
    return jnp.asarray(np.asarray(vals, np.float32))


def test_distance_square_center():
    # reference test_polyline_distance (PolylinesSimple.py:309-316)
    poly = Polyline.from_points(
        [[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0], [0.0, 0.0]]
    )
    d = distance(poly, _arr(0.5), _arr(0.5))
    np.testing.assert_allclose(np.asarray(d), [0.5], atol=1e-6)


def test_distance_batched_matches_oracle(rng):
    pts = rng.uniform(-2, 2, size=(17, 2)).astype(np.float32)
    poly = Polyline.from_points(pts)
    q = rng.uniform(-3, 3, size=(64, 2)).astype(np.float32)

    # NumPy oracle
    a, b = pts[:-1], pts[1:]
    u = b - a
    want = np.empty(len(q))
    for i, p in enumerate(q):
        v = p - a
        t = np.clip((v * u).sum(1) / (u * u).sum(1), 0, 1)
        c = a + t[:, None] * u
        want[i] = np.sqrt(((c - p) ** 2).sum(1)).min()

    got = np.asarray(distance(poly, jnp.asarray(q[:, 0]), jnp.asarray(q[:, 1])))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_closest_point_consistent_with_distance(rng):
    poly = circle_loop(1.0, n=16)
    q = rng.uniform(-2, 2, size=(32, 2)).astype(np.float32)
    px, py = jnp.asarray(q[:, 0]), jnp.asarray(q[:, 1])
    d, cx, cy = closest_point(poly, px, py)
    d2 = distance(poly, px, py)
    np.testing.assert_allclose(np.asarray(d), np.asarray(d2), rtol=1e-6)
    dd = np.sqrt((np.asarray(cx) - q[:, 0]) ** 2 + (np.asarray(cy) - q[:, 1]) ** 2)
    np.testing.assert_allclose(dd, np.asarray(d), rtol=1e-5, atol=1e-6)


def test_silhouette_wedge():
    # reference test_polyline_silhouette (PolylinesSimple.py:318-325)
    poly = Polyline.from_points([[0.0, 0.0], [1.0, 1.0], [2.0, 0.0]])
    m = is_silhouette(poly, _arr(1.5), _arr(0.6))
    assert np.asarray(m)[0, :1].tolist() == [True]


def test_silhouette_distance_wedge():
    # reference test_polyline_silhouette_distance (PolylinesSimple.py:327-334)
    poly = Polyline.from_points([[0.0, 0.0], [1.0, 1.0], [2.0, 0.0]])
    d = silhouette_distance(poly, _arr(1.5), _arr(0.6))
    want = np.hypot(0.5, 0.4)
    np.testing.assert_allclose(np.asarray(d), [want], rtol=1e-6)


def test_silhouette_open_segment_is_inf():
    # two-point open chain has no interior vertex -> +inf
    # (DCR top surface case, testGeophysicalScenario.py:99-102)
    poly = Polyline.from_points([[-100.0, 100.0], [100.0, 100.0]])
    d = silhouette_distance(poly, _arr(0.0), _arr(0.0))
    assert np.isinf(np.asarray(d)).all()


def test_first_hit_square():
    # reference test_polyline_intersect_polylines (PolylinesSimple.py:346-357)
    poly = square_loop(0.5, center=(0.5, 0.5))
    hx, hy, nx, ny, t, hit = first_hit(
        poly, _arr(0.5), _arr(0.5), _arr(1.0), _arr(0.0), _arr(2.0)
    )
    np.testing.assert_allclose(np.asarray(hx), [1.0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(hy), [0.5], atol=1e-6)
    # inward normal: against the +x ray
    np.testing.assert_allclose(np.asarray(nx), [-1.0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(ny), [0.0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(t), [0.5], atol=1e-6)
    assert bool(np.asarray(hit)[0])


def test_first_hit_true_ray_parameter():
    # A diagonal segment where ray parameter t != segment parameter s:
    # segment (2,-1)-(2,3), ray from origin along +x: t must be 2 (not s=0.25).
    poly = Polyline.from_points([[2.0, -1.0], [2.0, 3.0]])
    hx, hy, nx, ny, t, hit = first_hit(
        poly, _arr(0.0), _arr(0.0), _arr(1.0), _arr(0.0), _arr(10.0)
    )
    np.testing.assert_allclose(np.asarray(t), [2.0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(hx), [2.0], atol=1e-6)
    assert bool(np.asarray(hit)[0])
    # Non-axis-aligned: segment from (1,0) to (3,2), ray along direction (1,1)/sqrt2
    poly2 = Polyline.from_points([[3.0, 0.0], [0.0, 3.0]])
    s2 = 1.0 / np.sqrt(2.0)
    hx, hy, nx, ny, t, hit = first_hit(
        poly2, _arr(0.0), _arr(0.0), _arr(s2), _arr(s2), _arr(10.0)
    )
    np.testing.assert_allclose(np.asarray(t), [1.5 * np.sqrt(2)], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(hx), [1.5], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(hy), [1.5], rtol=1e-6)


def test_first_hit_miss_returns_sphere_point():
    poly = square_loop(1.0)
    hx, hy, nx, ny, t, hit = first_hit(
        poly, _arr(0.0), _arr(0.0), _arr(1.0), _arr(0.0), _arr(0.25)
    )
    assert not bool(np.asarray(hit)[0])
    np.testing.assert_allclose(np.asarray(hx), [0.25], atol=1e-6)
    np.testing.assert_allclose(np.asarray(nx), [0.0], atol=1e-7)
    np.testing.assert_allclose(np.asarray(t), [0.25], atol=1e-6)


def test_first_hit_normal_points_inward_regardless_of_winding():
    cw = Polyline.from_points(
        [[-1.0, -1.0], [-1.0, 1.0], [1.0, 1.0], [1.0, -1.0], [-1.0, -1.0]]
    )
    ccw = Polyline.from_points(
        [[-1.0, -1.0], [1.0, -1.0], [1.0, 1.0], [-1.0, 1.0], [-1.0, -1.0]]
    )
    for poly in (cw, ccw):
        _, _, nx, ny, _, hit = first_hit(
            poly, _arr(0.0), _arr(0.0), _arr(0.0), _arr(1.0), _arr(5.0)
        )
        assert bool(np.asarray(hit)[0])
        np.testing.assert_allclose(np.asarray(ny), [-1.0], atol=1e-6)


def test_concat_merges_chains():
    sq = square_loop(1.0)
    circ = circle_loop(0.3, n=8)
    both = Polyline.concat([sq, circ])
    assert both.num_segments == sq.num_segments + circ.num_segments
    d = distance(both, _arr(0.0), _arr(0.0))
    np.testing.assert_allclose(np.asarray(d), [0.3 * np.cos(np.pi / 8)], rtol=1e-5)


def test_func_to_polyline():
    poly = func_to_polyline(lambda x: 0.1 * x, -1.0, 1.0, 0.25)
    pts = np.asarray(poly.points)
    assert pts[0, 0] == -1.0
    np.testing.assert_allclose(pts[:, 1], 0.1 * pts[:, 0], rtol=1e-6)


def test_bounds():
    (x0, x1), (y0, y1) = square_loop(2.0, center=(1.0, -1.0)).bounds()
    assert (x0, x1, y0, y1) == (-1.0, 3.0, -3.0, 1.0)


def test_surface_line_and_heightmap_endpoints_exact():
    # Regressions: float arange overshot surface_electrode_line by a full
    # spacing on ~half of spacing/extent combos, and func_to_polyline
    # stopped short of x_max (leaving an escape gap against side walls).
    from dcrmontecarlo_tpu.geometry import func_to_polyline
    from dcrmontecarlo_tpu.survey import surface_electrode_line

    el = surface_electrode_line((-4.5, 4.5), 0.3)
    assert abs(el[-1, 0] - 4.5) < 1e-5, el[-1]
    assert len(el) == 31

    poly = func_to_polyline(lambda x: 0.0 * x, 0.0, 10.0, 1.0)
    a = np.asarray(poly.seg_a)[np.asarray(poly.seg_valid)]
    b = np.asarray(poly.seg_b)[np.asarray(poly.seg_valid)]
    assert abs(b[-1, 0] - 10.0) < 1e-5, b[-1]
    assert abs(a[0, 0] - 0.0) < 1e-5


def test_closest_point_chord_frame_and_interval():
    # Exact segment frame + chord support for the Robin chord machinery
    # (solver/wost.py, THEORY.md 4g): tangent comes from the segment DATA
    # (not the noisy (p - foot)/d direction), and [s_lo, s_hi] is the
    # parameter interval keeping foot + s*t_hat on the winning segment.
    from dcrmontecarlo_tpu.geometry import closest_point_chord

    poly = Polyline.from_points([[0.0, 0.0], [10.0, 0.0]])
    d, cx, cy, tx, ty, s_lo, s_hi = closest_point_chord(
        poly, _arr(3.0, -2.0), _arr(0.5, 0.1))
    np.testing.assert_allclose(
        np.asarray(d), [0.5, np.hypot(2.0, 0.1)], atol=1e-5)
    np.testing.assert_allclose(np.asarray(cx), [3.0, 0.0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(cy), [0.0, 0.0], atol=1e-6)
    # unit tangent along +x for both (second point clamps to the a-end)
    np.testing.assert_allclose(np.asarray(tx), [1.0, 1.0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(ty), [0.0, 0.0], atol=1e-6)
    # interval: first foot at s=3 of a 10-long segment -> [-3, 7];
    # end-clamped foot -> [0, 10]
    np.testing.assert_allclose(np.asarray(s_lo), [-3.0, 0.0], atol=1e-5)
    np.testing.assert_allclose(np.asarray(s_hi), [7.0, 10.0], atol=1e-5)


def test_closest_point_chord_picks_nearest_segment():
    from dcrmontecarlo_tpu.geometry import closest_point_chord

    # two walls: y=0 (horizontal) and x=5 (vertical); the point is nearer
    # the vertical one, so the frame must be the VERTICAL segment's
    poly = Polyline.concat([
        Polyline.from_points([[0.0, 0.0], [10.0, 0.0]]),
        Polyline.from_points([[5.0, 1.0], [5.0, 9.0]]),
    ])
    d, cx, cy, tx, ty, s_lo, s_hi = closest_point_chord(
        poly, _arr(4.5), _arr(4.0))
    np.testing.assert_allclose(np.asarray(d), [0.5], atol=1e-6)
    np.testing.assert_allclose(np.asarray(cx), [5.0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(cy), [4.0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(tx), [0.0], atol=1e-6)
    np.testing.assert_allclose(np.abs(np.asarray(ty)), [1.0], atol=1e-6)
