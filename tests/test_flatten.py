"""Flattening unit tests, ported from the reference (`path.rs:927-1628`)."""

import math

import numpy as np

from forma_tpu.math import MAX_ERROR, Point
from forma_tpu.path import PathBuilder, WeightedPoint, _Primitives


def wp(x, y, w=1.0):
    return WeightedPoint(Point(x, y), w)


def _dist(p, p1, p2):
    d10 = p1 - p
    d21 = p2 - p1
    return abs(d21.x * d10.y - d10.x * d21.y) / d21.len()


def _min_dist(p, points):
    return min(_dist(p, points[i], points[i + 1]) for i in range(len(points) - 1))


def _eval_quad(t, pts):
    def lerp(t, a, b):
        return t * b + (1 - t) * a

    x = lerp(t, lerp(t, pts[0].point.x, pts[1].point.x), lerp(t, pts[1].point.x, pts[2].point.x))
    y = lerp(t, lerp(t, pts[0].point.y, pts[1].point.y), lerp(t, pts[1].point.y, pts[2].point.y))
    return Point(x, y)


def test_quads():
    prim = _Primitives()
    c0 = [wp(2.0, 0.0), wp(0.0, 1.0), wp(10.0, 1.0)]
    c1 = [wp(10.0, 1.0), wp(20.0, 1.0), wp(18.0, 0.0)]
    prim.push_quad(c0)
    prim.push_quad(c1)
    segments = prim.into_segments()

    assert len(segments.x) == 9
    assert segments.x[0] == 2.0 and segments.y[0] == 0.0
    assert segments.x[8] == 18.0 and segments.y[8] == 0.0

    a = Point(float(segments.x[3]), float(segments.y[3]))
    b = Point(float(segments.x[5]), float(segments.y[5]))
    assert (a - b).len() > 10.0

    points = [Point(float(x), float(y)) for x, y in zip(segments.x, segments.y)]
    for c in (c0, c1):
        worst = max(
            _min_dist(_eval_quad(i / 50.0, c), points) for i in range(51)
        )
        assert worst < MAX_ERROR


def test_two_splines():
    prim = _Primitives()
    prim.push_quad([wp(0, 0), wp(1, 2), wp(2, 0)])
    prim.push_quad([wp(3, 0), wp(4, 4), wp(5, 0)])
    segments = prim.into_segments()
    assert len(segments.x) == 11
    assert (segments.x[0], segments.y[0]) == (0.0, 0.0)
    assert (segments.x[4], segments.y[4]) == (2.0, 0.0)
    assert (segments.x[5], segments.y[5]) == (3.0, 0.0)
    assert (segments.x[10], segments.y[10]) == (5.0, 0.0)


def test_collinear_quad():
    prim = _Primitives()
    prim.push_quad([wp(0.0, 0.0), wp(2.0, 0.0001), wp(1.0, 0.0)])
    segments = prim.into_segments()
    assert len(segments.x) == 3
    assert abs(segments.x[1] - 1.25) < 0.01
    assert abs(segments.y[1] - 0.0) < 0.01


def test_overlapping_control_point_quad():
    prim = _Primitives()
    prim.push_quad([wp(0, 0), wp(0, 0), wp(1, 1)])
    prim.push_quad([wp(1, 1), wp(1, 1), wp(1, 1)])
    prim.push_quad([wp(1, 1), wp(2, 2), wp(2, 2)])
    segments = prim.into_segments()
    assert len(segments.x) == 2
    assert abs(segments.x[0] - 0.0) < 0.01
    assert abs(segments.x[1] - 2.0) < 0.01
    assert abs(segments.y[1] - 2.0) < 0.01


def test_rat_quad():
    prim = _Primitives()
    weight = 10.0
    prim.push_quad([wp(0, 0), wp(1 * weight, 2 * weight, weight), wp(2, 0)])
    segments = prim.into_segments()
    assert len(segments.x) == 5
    points = [Point(float(x), float(y)) for x, y in zip(segments.x, segments.y)]
    assert abs(points[2].x - 1.0) <= 0.001
    distances = [(points[i + 1] - points[i]).len() for i in range(4)]
    assert distances[0] > 1.5
    assert distances[1] < 0.2
    assert distances[2] < 0.2
    assert distances[3] > 1.5


def test_lines_and_quads():
    prim = _Primitives()
    prim.push_line([wp(-1, -2), wp(0, 0)])
    prim.push_quad([wp(0, 0), wp(1, 2), wp(2, 0)])
    prim.push_line([wp(2, 0), wp(3, -2)])
    prim.push_line([wp(3, -2), wp(4, 2)])
    prim.push_line([wp(4, 2), wp(5, -4)])
    prim.push_line([wp(5, -4), wp(6, 0)])
    prim.push_quad([wp(6, 0), wp(7, 4), wp(8, 0)])
    prim.push_line([wp(8, 0), wp(9, -4)])
    segments = prim.into_segments()
    assert len(segments.x) == 12
    assert (segments.x[0], segments.y[0]) == (-1.0, -2.0)
    assert (segments.x[4], segments.y[4]) == (3.0, -2.0)
    assert (segments.x[5], segments.y[5]) == (4.0, 2.0)


def test_cubic():
    prim = _Primitives()
    prim.push_cubic([wp(0, 0), wp(2, 2), wp(4, 2), wp(6, 0)])
    segments = prim.into_segments()
    # The reference emits 6 points for this cubic (path.rs:1203-1227).
    assert len(segments.x) == 6
    assert (segments.x[0], segments.y[0]) == (0.0, 0.0)
    assert (segments.x[-1], segments.y[-1]) == (6.0, 0.0)


def test_circle_accuracy():
    """Flattened circle points stay within MAX_ERROR of the true circle."""
    radius = 50.0
    weight = math.sqrt(2.0) / 2.0
    b = PathBuilder()
    b.move_to(Point(radius, 0.0))
    b.rat_quad_to(Point(radius, -radius), Point(0.0, -radius), weight)
    b.rat_quad_to(Point(-radius, -radius), Point(-radius, 0.0), weight)
    b.rat_quad_to(Point(-radius, radius), Point(0.0, radius), weight)
    b.rat_quad_to(Point(radius, radius), Point(radius, 0.0), weight)
    path = b.build()
    x, y, snc = path.push_segments_to()
    r = np.hypot(x.astype(np.float64), y.astype(np.float64))
    assert np.abs(r - radius).max() < MAX_ERROR
    # Enough subdivision to be smooth:
    assert len(x) > 40


def test_path_closing():
    path = (
        PathBuilder()
        .move_to(Point(1.0, 2.0))
        .line_to(Point(3.0, 4.0))
        .line_to(Point(5.0, 2.0))
        .build()
    )
    x, y, snc = path.push_segments_to()
    # Implicit close back to the open point.
    assert (x[0], y[0]) == (1.0, 2.0)
    assert (x[-1], y[-1]) == (1.0, 2.0)


def test_transform_shares_geometry():
    path = (
        PathBuilder().move_to(Point(0, 0)).line_to(Point(4, 4)).build()
    )
    moved = path.transform([1.0, 0.0, 10.0, 0.0, 1.0, -3.0, 0.0, 0.0, 1.0])
    assert moved._inner is path._inner  # cached flattening reused
    x, y, _ = moved.push_segments_to()
    assert x[0] == 10.0 and y[0] == -3.0


def test_perspective_transform_reflattens():
    path = (
        PathBuilder()
        .move_to(Point(0, 0))
        .line_to(Point(4, 4))
        .line_to(Point(4, 0))
        .build()
    )
    warped = path.transform([1.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.01, 0.0, 1.0])
    assert warped._inner is not path._inner
    x, y, _ = warped.push_segments_to()
    # w at (4, 4) is 1.04 => that corner maps to ~3.846.
    assert abs(max(y) - 4.0 / 1.04) < 1e-2


def test_rat_cubic_high():
    # `path.rs:1229-1255`
    prim = _Primitives()
    w = 10.0
    prim.push_cubic([
        wp(0.0, 0.0, 1.0),
        wp(5.0 * w, 3.0 * w, w),
        wp(-1.0 * w, 3.0 * w, w),
        wp(4.0, 0.0, 1.0),
    ])
    segments = prim.into_segments()
    assert len(segments.x) == 45


def test_rat_cubic_low():
    # `path.rs:1257-1284`
    prim = _Primitives()
    w = 0.5
    prim.push_cubic([
        wp(0.0, 0.0, 1.0),
        wp(5.0 * w, 3.0 * w, w),
        wp(-1.0 * w, 3.0 * w, w),
        wp(4.0, 0.0, 1.0),
    ])
    segments = prim.into_segments()
    assert len(segments.x) == 7


def test_collinear_cubic():
    # `path.rs:1287-1314`
    prim = _Primitives()
    prim.push_cubic([wp(1, 0), wp(0, 0), wp(3, 0), wp(2, 0)])
    segments = prim.into_segments()
    assert len(segments.x) == 5
    assert segments.x[0] == 1.0 and segments.y[0] == 0.0
    assert 0.5 < segments.x[1] < 1.0 and segments.y[1] == 0.0
    assert 1.0 < segments.x[2] < 2.0 and segments.y[2] == 0.0
    assert 2.0 < segments.x[3] < 2.5 and segments.y[3] == 0.0
    assert segments.x[4] == 2.0 and segments.y[4] == 0.0


def test_overlapping_control_point_cubic_line():
    # `path.rs:1316-1344`
    prim = _Primitives()
    prim.push_cubic([wp(0, 0), wp(0, 0), wp(1, 1), wp(1, 1)])
    prim.push_cubic([wp(1, 1), wp(1, 1), wp(1, 1), wp(1, 1)])
    prim.push_cubic([wp(1, 1), wp(1, 1), wp(2, 2), wp(2, 2)])
    segments = prim.into_segments()
    assert len(segments.x) == 9
    assert (np.diff(segments.x) > 0).all()
    assert (np.diff(segments.y) > 0).all()
    np.testing.assert_array_equal(segments.x, segments.y)
    assert abs(segments.x[0] - 0.0) < 0.01 and abs(segments.y[0] - 0.0) < 0.01
    assert abs(segments.x[8] - 2.0) < 0.01 and abs(segments.y[8] - 2.0) < 0.01


def test_ring():
    # `path.rs:1346-1377`: two closed contours; contour starts land exactly
    # where the reference's do.
    prim = _Primitives()
    prim.push_cubic([wp(0, 2), wp(2, 2), wp(2, 2), wp(2, 0)])
    prim.push_cubic([wp(2, 0), wp(2, -2), wp(2, -2), wp(0, -2)])
    prim.push_cubic([wp(0, -2), wp(-2, -2), wp(-2, -2), wp(-2, 0)])
    prim.push_cubic([wp(-2, 0), wp(-2, 2), wp(-2, 2), wp(0, 2)])
    prim.push_contour()
    prim.push_cubic([wp(0, 1), wp(-1, 1), wp(-1, 1), wp(-1, 0)])
    prim.push_cubic([wp(-1, 0), wp(-1, -1), wp(-1, -1), wp(0, -1)])
    prim.push_cubic([wp(0, -1), wp(1, -1), wp(1, -1), wp(1, 0)])
    prim.push_cubic([wp(1, 0), wp(1, 1), wp(1, 1), wp(0, 1)])
    segments = prim.into_segments()
    assert len(segments.start_new_contour) == 30
    assert int(np.sum(segments.start_new_contour)) == 2
    assert segments.start_new_contour[16]
    assert segments.start_new_contour[29]


def test_ring_overlapping_start():
    # `path.rs:1379-1410`: second contour starts at the first's start point.
    prim = _Primitives()
    prim.push_cubic([wp(0, 1), wp(-1, 1), wp(-1, 1), wp(-1, 0)])
    prim.push_cubic([wp(-1, 0), wp(-1, -1), wp(-1, -1), wp(0, -1)])
    prim.push_cubic([wp(0, -1), wp(1, -1), wp(1, -1), wp(1, 0)])
    prim.push_cubic([wp(1, 0), wp(1, 1), wp(1, 1), wp(0, 1)])
    prim.push_contour()
    prim.push_cubic([wp(0, 1), wp(1, 1), wp(1, 1), wp(1, 2)])
    prim.push_cubic([wp(1, 2), wp(1, 3), wp(1, 3), wp(0, 3)])
    prim.push_cubic([wp(0, 3), wp(-1, 3), wp(-1, 3), wp(-1, 2)])
    prim.push_cubic([wp(-1, 2), wp(-1, 1), wp(-1, 1), wp(0, 1)])
    segments = prim.into_segments()
    assert len(segments.start_new_contour) == 26
    assert int(np.sum(segments.start_new_contour)) == 2
    assert segments.start_new_contour[12]
    assert segments.start_new_contour[25]

def test_circle_quadrants_point_count():
    # `path.rs:1411-1492`: a radius-50 circle from four rational quads
    # emits exactly 66 points, every flattened step shorter than 5 px.
    prim = _Primitives()
    radius = 50.0
    weight = math.sqrt(2.0) / 2.0
    prim.push_quad([wp(radius, 0.0), wp(0.0, 0.0, weight), wp(0.0, radius)])
    prim.push_quad([
        wp(0.0, radius),
        wp(0.0, 2.0 * radius * weight, weight),
        wp(radius, 2.0 * radius),
    ])
    prim.push_quad([
        wp(radius, 2.0 * radius),
        wp(2.0 * radius * weight, 2.0 * radius * weight, weight),
        wp(2.0 * radius, radius),
    ])
    prim.push_quad([
        wp(2.0 * radius, radius),
        wp(2.0 * radius * weight, 0.0, weight),
        wp(radius, 0.0),
    ])
    segments = prim.into_segments()
    assert len(segments.x) == 66
    pts = np.stack([segments.x, segments.y], axis=1).astype(np.float64)
    steps = np.hypot(*np.diff(pts, axis=0).T)
    assert steps.max() < 5.0


def test_transform_path():
    # `path.rs:1494-1566`: translation shares the flattening (same point
    # count, shifted); a 2x scale re-flattens with MORE points at the
    # scaled radius.
    weight = math.sqrt(2.0) / 2.0
    radius = 10.0
    b = PathBuilder()
    b.move_to(Point(radius, 0.0))
    b.rat_quad_to(Point(radius, -radius), Point(0.0, -radius), weight)
    b.rat_quad_to(Point(-radius, -radius), Point(-radius, 0.0), weight)
    b.rat_quad_to(Point(-radius, radius), Point(0.0, radius), weight)
    b.rat_quad_to(Point(radius, radius), Point(radius, 0.0), weight)
    path = b.build()

    x, y, _ = path.push_segments_to()
    orig_len = len(x)
    r = np.hypot(np.asarray(x, np.float64), np.asarray(y, np.float64))
    assert np.abs(r - radius).max() <= 0.1

    dx, dy = 5.0, 20.0
    moved = path.transform([1.0, 0.0, dx, 0.0, 1.0, dy, 0.0, 0.0, 1.0])
    x, y, _ = moved.push_segments_to()
    assert len(x) == orig_len
    r = np.hypot(np.asarray(x, np.float64) - dx, np.asarray(y, np.float64) - dy)
    assert np.abs(r - radius).max() <= 0.1

    s = 2.0
    scaled = path.transform([s, 0.0, 0.0, 0.0, s, 0.0, 0.0, 0.0, 1.0])
    x, y, _ = scaled.push_segments_to()
    r = np.hypot(np.asarray(x, np.float64), np.asarray(y, np.float64))
    assert np.abs(r - s * radius).max() <= 0.1
    assert len(x) > orig_len


def test_perspective_transform_path():
    # `path.rs:1568-1627`: a circle far from the origin under a perspective
    # transform squishes horizontally: across-point distances range from
    # radius/2 (squeezed diameter) to radius.
    weight = math.sqrt(2.0) / 2.0
    radius = 10.0
    tr = 1000.0
    b = PathBuilder()
    b.move_to(Point(radius + tr, 0.0))
    b.rat_quad_to(Point(radius + tr, -radius), Point(tr, -radius), weight)
    b.rat_quad_to(Point(-radius + tr, -radius), Point(-radius + tr, 0.0), weight)
    b.rat_quad_to(Point(-radius + tr, radius), Point(tr, radius), weight)
    b.rat_quad_to(Point(radius + tr, radius), Point(radius + tr, 0.0), weight)
    path = b.build().transform(
        [1.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.001, 0.0, 1.0]
    )
    x, y, _ = path.push_segments_to()
    pts = np.stack([x, y], axis=1).astype(np.float64)[:-1]  # drop dup close
    half = len(pts) // 2
    idx = np.arange(half)
    opposite = pts[(idx + half) % len(pts)]
    d = np.hypot(*(pts[idx] - opposite).T)
    assert abs(d.min() - radius / 2.0) <= 0.2
    assert abs(d.max() - radius) <= 0.2
