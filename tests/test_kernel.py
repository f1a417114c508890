"""Geometry kernel tests: PIP parity, orientation, distance, area, centroid.

Cases mirror the reference's semantic landmines: on-boundary short-circuit,
vertex crossings counted once, horizontal edges, holes (even-odd parity),
within-vs-contains point semantics (PointInPolygon.h:39-72,
MCIndex.cpp:59-119, WithinFilter.cpp:60-63, ContainsPointFilter.cpp:11-25).
"""

import numpy as np
import pytest

from libgeodesk_spark.geom import kernel
from libgeodesk_spark.geom.zones import prepare_zone, rings_to_edges

SQ = np.array([[0, 0], [100, 0], [100, 100], [0, 100], [0, 0]], dtype=np.int64)


def ring(*pts):
    pts = list(pts)
    if pts[0] != pts[-1]:
        pts.append(pts[0])
    return np.array(pts, dtype=np.int64)


def locate(px, py, rings):
    edges = rings_to_edges([np.asarray(r) for r in rings])
    return kernel.locate_points(np.atleast_1d(px), np.atleast_1d(py), edges)


class TestLocateSquare:
    def test_inside_outside(self):
        edges = rings_to_edges([SQ])
        px = np.array([50, -1, 101, 50, 50])
        py = np.array([50, 50, 50, -1, 101])
        assert list(kernel.locate_points(px, py, edges)) == [1, -1, -1, -1, -1]

    def test_boundary_edges_and_vertices(self):
        edges = rings_to_edges([SQ])
        # on each edge, and on each vertex -> BOUNDARY (0)
        px = np.array([50, 0, 100, 50, 0, 100, 0, 100])
        py = np.array([0, 50, 50, 100, 0, 0, 100, 100])
        assert list(kernel.locate_points(px, py, edges)) == [0] * 8

    def test_ray_through_vertex_counted_once(self):
        # a diamond: ray from a point west of vertex (0,50) passes exactly
        # through vertices of two edges; parity must still be correct
        diamond = ring((50, 0), (100, 50), (50, 100), (0, 50))
        assert locate(-10, 50, [diamond])[0] == -1     # outside, through W vertex
        assert locate(25, 50, [diamond])[0] == 1       # inside, exits through E vertex
        assert locate(50, 50, [diamond])[0] == 1
        assert locate(0, 50, [diamond])[0] == 0        # on the vertex itself

    def test_horizontal_edge_collinear_ray(self):
        edges = rings_to_edges([SQ])
        # point west of the square, level with its bottom edge: outside
        assert kernel.locate_points([-50], [0], edges)[0] == -1
        # level with the top edge: outside
        assert kernel.locate_points([-50], [100], edges)[0] == -1
        # east of the square, level with bottom edge
        assert kernel.locate_points([150], [0], edges)[0] == -1

    def test_clockwise_ring_same_result(self):
        cw = SQ[::-1].copy()
        edges = rings_to_edges([cw])
        assert kernel.locate_points([50], [50], edges)[0] == 1
        assert kernel.locate_points([-1], [50], edges)[0] == -1
        assert kernel.locate_points([0], [50], edges)[0] == 0


class TestLocateHoles:
    def test_even_odd_hole(self):
        hole = ring((40, 40), (60, 40), (60, 60), (40, 60))
        rings = [SQ, hole]
        assert locate(50, 50, rings)[0] == -1       # in the hole = outside
        assert locate(20, 20, rings)[0] == 1        # in the shell
        assert locate(40, 50, rings)[0] == 0        # on the hole boundary
        assert locate(-5, 50, rings)[0] == -1

    def test_multipolygon(self):
        sq2 = ring((200, 0), (300, 0), (300, 100), (200, 100))
        rings = [SQ, sq2]
        assert locate(50, 50, rings)[0] == 1
        assert locate(250, 50, rings)[0] == 1
        assert locate(150, 50, rings)[0] == -1


class TestLocateConcave:
    def test_comb(self):
        # concave "comb" with two teeth
        comb = ring((0, 0), (100, 0), (100, 80), (80, 80), (80, 30),
                    (60, 30), (60, 80), (40, 80), (40, 30), (20, 30),
                    (20, 80), (0, 80))
        assert locate(10, 50, [comb])[0] == 1    # left tooth (solid)
        assert locate(30, 50, [comb])[0] == -1   # notch
        assert locate(50, 50, [comb])[0] == 1    # middle tooth
        assert locate(70, 50, [comb])[0] == -1   # notch
        assert locate(90, 50, [comb])[0] == 1    # right tooth
        assert locate(50, 10, [comb])[0] == 1    # below the teeth: solid
        assert locate(20, 50, [comb])[0] == 0    # on the tooth wall

    def test_convex_random_agreement(self):
        # independent oracle: convex polygon -> inside iff all cross
        # products have the same sign; boundary iff some cross==0 within extent
        rng = np.random.default_rng(3)
        ang = np.sort(rng.uniform(0, 2 * np.pi, 12))
        vx = (np.cos(ang) * 5000).astype(np.int64)
        vy = (np.sin(ang) * 5000).astype(np.int64)
        poly = np.stack([vx, vy], axis=1)
        edges = rings_to_edges([poly])
        px = rng.integers(-6000, 6000, 4000)
        py = rng.integers(-6000, 6000, 4000)
        got = kernel.locate_points(px, py, edges)

        ax, ay = edges[:, 0], edges[:, 1]
        bx, by = edges[:, 2], edges[:, 3]
        cross = ((bx - ax)[None, :] * (py[:, None] - ay[None, :])
                 - (by - ay)[None, :] * (px[:, None] - ax[None, :]))
        on_seg = (cross == 0) \
            & (px[:, None] >= np.minimum(ax, bx)[None, :]) \
            & (px[:, None] <= np.maximum(ax, bx)[None, :]) \
            & (py[:, None] >= np.minimum(ay, by)[None, :]) \
            & (py[:, None] <= np.maximum(ay, by)[None, :])
        boundary = on_seg.any(axis=1)
        inside = (cross > 0).all(axis=1) & ~boundary   # CCW ring
        want = np.where(boundary, 0, np.where(inside, 1, -1))
        assert np.array_equal(got.astype(np.int64), want)


class TestSemanticVariants:
    def test_within_vs_contains_points(self):
        edges = rings_to_edges([SQ])
        px = np.array([50, 0, -10])
        py = np.array([50, 50, 50])
        # within (node): strictly inside only (WithinFilter.cpp:60-63)
        assert list(kernel.properly_contains(px, py, edges)) == [True, False, False]
        # contains_point: boundary counts (ContainsPointFilter.cpp:11-25)
        assert list(kernel.contains_points(px, py, edges)) == [True, True, False]


class TestOrientation:
    def test_basic(self):
        # Reference convention (LineSegment.cpp:9-17): ccw = q×d, so a
        # point ABOVE the rightward segment (0,0)->(10,0) is "clockwise" -1.
        assert kernel.orientation(0, 0, 10, 0, 5, 5)[()] == -1
        assert kernel.orientation(0, 0, 10, 0, 5, -5)[()] == 1
        assert kernel.orientation(0, 0, 10, 0, 5, 0)[()] == 0

    def test_collinear_refinement(self):
        # collinear but before the start -> -1; after the end -> +1; on -> 0
        # (LineSegment.cpp:24-34)
        assert kernel.orientation(0, 0, 10, 0, -5, 0)[()] == -1
        assert kernel.orientation(0, 0, 10, 0, 15, 0)[()] == 1
        assert kernel.orientation(0, 0, 10, 0, 0, 0)[()] == 0
        assert kernel.orientation(0, 0, 10, 0, 10, 0)[()] == 0

    def test_segments_intersect(self):
        assert kernel.segments_intersect(0, 0, 10, 10, 0, 10, 10, 0)[()]
        assert not kernel.segments_intersect(0, 0, 10, 10, 20, 0, 30, 10)[()]
        # touching at an endpoint counts (orientation 0)
        assert kernel.segments_intersect(0, 0, 10, 10, 10, 10, 20, 0)[()]
        # collinear overlapping
        assert kernel.segments_intersect(0, 0, 10, 0, 5, 0, 15, 0)[()]
        # collinear disjoint
        assert not kernel.segments_intersect(0, 0, 10, 0, 11, 0, 20, 0)[()]


class TestDistance:
    def test_point_segment(self):
        # perpendicular projection
        assert kernel.point_segment_sq_dist(0, 0, 10, 0, 5, 3)[()] == pytest.approx(9.0)
        # beyond the end -> distance to endpoint
        assert kernel.point_segment_sq_dist(0, 0, 10, 0, 13, 4)[()] == pytest.approx(25.0)
        # before the start
        assert kernel.point_segment_sq_dist(0, 0, 10, 0, -3, 4)[()] == pytest.approx(25.0)
        # on the segment
        assert kernel.point_segment_sq_dist(0, 0, 10, 0, 5, 0)[()] == pytest.approx(0.0)

    def test_point_point_exact(self):
        d = kernel.point_point_sq_dist(np.array([0]), np.array([0]),
                                       np.array([3]), np.array([4]))
        assert d[0] == 25


class TestAreaCentroid:
    def test_shoelace(self):
        assert kernel.shoelace2(SQ[:, 0], SQ[:, 1]) == 2 * 100 * 100  # CCW positive
        assert kernel.shoelace2(SQ[::-1, 0], SQ[::-1, 1]) == -2 * 100 * 100

    def test_area_m2_at_equator(self):
        # 1000x1000 units at y~0: scale ~ (C/2^32)^2
        big = ring((0, 0), (1000, 0), (1000, 1000), (0, 1000))
        from libgeodesk_spark.mercator import meters_per_unit_at_y
        want = 1000 * 1000 * meters_per_unit_at_y(500) ** 2
        assert kernel.ring_area_m2(big[:, 0], big[:, 1]) == pytest.approx(want)

    def test_areal_centroid(self):
        assert kernel.areal_centroid([(SQ[:, 0], SQ[:, 1])]) == (50, 50)
        # with a hole offset to one side, centroid moves away from the hole.
        # NOTE reference convention (Centroid.h:52): hole rings are passed
        # CCW as well; the isShell=False sign flips their contribution.
        hole = ring((60, 40), (80, 40), (80, 60), (60, 60))
        cx, cy = kernel.areal_centroid(
            [(SQ[:, 0], SQ[:, 1]), (hole[:, 0], hole[:, 1])],
            shells=[True, False])
        assert cx < 50 and cy == 50

    def test_lineal_centroid(self):
        xs = np.array([0, 10, 10])
        ys = np.array([0, 0, 10])
        assert kernel.lineal_centroid(xs, ys) == (8, 3)  # (7.5, 2.5) rounded away

    def test_puntal_centroid(self):
        assert kernel.puntal_centroid([0, 10], [0, 10]) == (5, 5)

    def test_length(self):
        from libgeodesk_spark.mercator import meters_per_unit_at_y
        xs = np.array([0, 300])
        ys = np.array([0, 400])
        want = 500 * meters_per_unit_at_y(200)
        assert kernel.way_length_m(xs, ys) == pytest.approx(want)


class TestCrosses:
    def test_any_segment_crosses(self):
        edges = rings_to_edges([SQ])
        # segment entering the square
        assert kernel.any_segment_crosses([-10], [50], [50], [50], edges)[0]
        # fully inside: no boundary crossing
        assert not kernel.any_segment_crosses([20], [20], [80], [80], edges)[0]
        # fully outside
        assert not kernel.any_segment_crosses([-50], [-50], [-10], [-10], edges)[0]


# --- kNN ring/gap helpers (grid-edge clamping, ADVICE knn.py:91) -----------

def test_ring_cells_clamped_at_grid_edge():
    from libgeodesk_spark.operators.knn import _ring_cells
    cells = _ring_cells(0, 0, 1, 4)          # corner cell: ring-1 = 3 cells
    assert len(cells) == 3
    full = _ring_cells(5, 5, 1, 4)
    assert len(full) == 8


def test_covered_gap_clamps_and_exhausts():
    from libgeodesk_spark.mercator import cell_bounds, cell_from_col_row
    from libgeodesk_spark.operators.knn import _covered_gap
    zoom = 4
    mnx, mny, mxx, mxy = cell_bounds(int(cell_from_col_row(5, 5, zoom)))
    qx, qy = (mnx + mxx) // 2, (mny + mxy) // 2
    g = _covered_gap(qx, qy, 5, 5, 1, zoom)
    assert g is not None and g > 0
    # whole grid covered -> None (no unexplored cells remain)
    assert _covered_gap(qx, qy, 5, 5, 16, zoom) is None
    # covered box pinned to the west edge: west side contributes no bound
    mnx0, _, mxx0, _ = cell_bounds(int(cell_from_col_row(0, 5, zoom)))
    qx0 = (mnx0 + mxx0) // 2
    g_edge = _covered_gap(qx0, qy, 0, 5, 0, zoom)
    g_mid = _covered_gap(qx, qy, 5, 5, 0, zoom)
    assert g_edge is not None and g_edge > 0
    assert g_mid is not None and g_mid > 0
    # at the corner with rows+cols clamped on two sides, still positive
    g_corner = _covered_gap(qx0, qy, 0, 5, 5, zoom)
    assert g_corner is not None and g_corner > 0
