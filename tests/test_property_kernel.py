"""Property-based tests (hypothesis) for the geometry kernel and tile math.

Metamorphic properties that must hold exactly (integer arithmetic):
translation/reflection/vertex-order invariance of locate, edge-split
invariance at exactly-collinear points, symmetry of segment intersection,
containment of coordinates in their assigned cells, projection roundtrip.
"""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from libgeodesk_spark import mercator as M
from libgeodesk_spark.geom import kernel

COORD = st.integers(-10_000, 10_000)


@st.composite
def polygon(draw, max_vertices=10):
    n = draw(st.integers(3, max_vertices))
    pts = []
    seen = set()
    for _ in range(n):
        p = (draw(COORD), draw(COORD))
        if p not in seen:
            seen.add(p)
            pts.append(p)
    if len(pts) < 3:
        pts = [(0, 0), (10, 0), (0, 10)]
    pts.append(pts[0])
    return np.array(pts, dtype=np.int64)


def edges_of(poly):
    return np.hstack([poly[:-1], poly[1:]])


@st.composite
def poly_and_points(draw):
    poly = draw(polygon())
    k = draw(st.integers(1, 20))
    px = np.array([draw(COORD) for _ in range(k)], dtype=np.int64)
    py = np.array([draw(COORD) for _ in range(k)], dtype=np.int64)
    return poly, px, py


@settings(max_examples=150, deadline=None)
@given(poly_and_points(), st.integers(-10**6, 10**6), st.integers(-10**6, 10**6))
def test_translation_invariance(data, dx, dy):
    poly, px, py = data
    a = kernel.locate_points(px, py, edges_of(poly))
    moved = poly + np.array([dx, dy])
    b = kernel.locate_points(px + dx, py + dy, edges_of(moved))
    assert np.array_equal(a, b)


@settings(max_examples=150, deadline=None)
@given(poly_and_points())
def test_reflection_invariance(data):
    poly, px, py = data
    a = kernel.locate_points(px, py, edges_of(poly))
    mx = poly * np.array([-1, 1])
    assert np.array_equal(a, kernel.locate_points(-px, py, edges_of(mx)))
    my = poly * np.array([1, -1])
    assert np.array_equal(a, kernel.locate_points(px, -py, edges_of(my)))


@settings(max_examples=150, deadline=None)
@given(poly_and_points())
def test_vertex_order_reversal(data):
    poly, px, py = data
    a = kernel.locate_points(px, py, edges_of(poly))
    b = kernel.locate_points(px, py, edges_of(poly[::-1].copy()))
    assert np.array_equal(a, b)


@settings(max_examples=150, deadline=None)
@given(poly_and_points())
def test_edge_split_invariance(data):
    """Splitting every edge at its exact midpoint (even coordinates, so the
    midpoint is collinear in integers) must not change any location."""
    poly, px, py = data
    poly2 = poly * 2           # make all midpoints exact
    a = kernel.locate_points(px * 2, py * 2, edges_of(poly2))
    split = []
    for (x1, y1), (x2, y2) in zip(poly2[:-1], poly2[1:]):
        split.append((x1, y1))
        split.append(((x1 + x2) // 2, (y1 + y2) // 2))
    split.append(tuple(poly2[-1]))
    split = np.array(split, dtype=np.int64)
    b = kernel.locate_points(px * 2, py * 2, edges_of(split))
    assert np.array_equal(a, b)


@settings(max_examples=150, deadline=None)
@given(st.tuples(COORD, COORD, COORD, COORD, COORD, COORD, COORD, COORD))
def test_segment_intersect_symmetry(seg):
    x1, y1, x2, y2, x3, y3, x4, y4 = seg
    a = kernel.segments_intersect(x1, y1, x2, y2, x3, y3, x4, y4)
    b = kernel.segments_intersect(x3, y3, x4, y4, x1, y1, x2, y2)
    assert bool(a) == bool(b)
    # endpoint swap invariance
    c = kernel.segments_intersect(x2, y2, x1, y1, x3, y3, x4, y4)
    assert bool(a) == bool(c)


@settings(max_examples=150, deadline=None)
@given(st.tuples(COORD, COORD, COORD, COORD, COORD, COORD))
def test_orientation_zero_iff_on_segment(seg):
    x1, y1, x2, y2, px, py = seg
    o = int(kernel.orientation(x1, y1, x2, y2, px, py))
    # zero orientation must coincide with zero point-segment distance
    d = float(kernel.point_segment_sq_dist(x1, y1, x2, y2, px, py))
    if (x1, y1) != (x2, y2):
        assert (o == 0) == (d == 0.0)


@settings(max_examples=200, deadline=None)
@given(st.integers(-2**31, 2**31 - 1), st.integers(-2**31, 2**31 - 1),
       st.sampled_from([0, 2, 4, 6, 8, 10, 12]))
def test_cell_contains_its_point(x, y, zoom):
    c = int(M.cell_id(x, y, zoom))
    mnx, mny, mxx, mxy = M.cell_bounds(c)
    assert mnx <= x <= mxx and mny <= y <= mxy


@settings(max_examples=200, deadline=None)
@given(st.floats(-179.9999999, 179.9999999),
       st.floats(-85.0, 85.0))
def test_projection_roundtrip(lon, lat):
    assert abs(M.lon_from_x(M.x_from_lon(lon)) - lon) < 1.2e-7
    assert abs(M.lat_from_y(M.y_from_lat(lat)) - lat) < 1.2e-7


@settings(max_examples=100, deadline=None)
@given(polygon())
def test_shoelace_reversal_negates(poly):
    s = kernel.shoelace2(poly[:, 0], poly[:, 1])
    r = kernel.shoelace2(poly[::-1, 0].copy(), poly[::-1, 1].copy())
    assert s == -r


def test_blocked_locate_identical_to_loop():
    """The blocked 2D locate path must be bit-identical to the per-edge
    loop on adversarial inputs (boundary probes, vertices, degenerate
    edges) — the gate zones plus random probes."""
    import numpy as np

    from libgeodesk_spark.geom import kernel
    from libgeodesk_spark.geom.zones import rings_to_edges
    from libgeodesk_spark.sources.points import GATE_ZONES

    rng = np.random.default_rng(11)
    for rings in GATE_ZONES.values():
        edges = rings_to_edges([np.array(r) for r in rings])
        # random probes + every vertex + midpoints of every edge
        px = rng.integers(edges[:, 0].min() - 10**6,
                          edges[:, 2].max() + 10**6, 4000)
        py = rng.integers(edges[:, 1].min() - 10**6,
                          edges[:, 3].max() + 10**6, 4000)
        px = np.concatenate([px, edges[:, 0], (edges[:, 0] + edges[:, 2]) // 2])
        py = np.concatenate([py, edges[:, 1], (edges[:, 1] + edges[:, 3]) // 2])
        # degenerate edge appended
        e2 = np.vstack([edges, [[px[0], py[0], px[0], py[0]]]])
        # force both paths
        old_max = kernel._EDGE_LOOP_MAX
        try:
            kernel._EDGE_LOOP_MAX = 10**9
            a = kernel.locate_points(px, py, e2)
        finally:
            kernel._EDGE_LOOP_MAX = old_max
        b = kernel._locate_points_blocked(
            np.asarray(px, dtype=np.int64), np.asarray(py, dtype=np.int64),
            np.asarray(e2, dtype=np.int64))
        assert np.array_equal(a, b)
