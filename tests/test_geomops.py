"""Convex hull + Douglas-Peucker kernels (geom/hull.py) and their
grouped Spark operators (operators/geomops.py)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from libgeodesk_spark.geom.hull import convex_hull, hull_area2, simplify_ring


def _brute_hull_membership(pts, hull):
    """Every input point is inside-or-on the hull (cross >= 0 for every
    CCW edge), and every hull vertex is an input point."""
    hs = {tuple(p) for p in hull}
    assert hs <= {tuple(p) for p in pts}
    n = len(hull)
    if n < 3:
        return
    for p in pts:
        for i in range(n):
            a, b = hull[i], hull[(i + 1) % n]
            cr = int(b[0] - a[0]) * int(p[1] - a[1]) \
                - int(b[1] - a[1]) * int(p[0] - a[0])
            assert cr >= 0, (p, a, b)


class TestHullKernel:
    def test_random_points(self):
        rng = np.random.default_rng(3)
        for n in (3, 10, 200):
            pts = rng.integers(-10**6, 10**6, size=(n, 2))
            h = convex_hull(pts)
            _brute_hull_membership(pts, h)
            # CCW orientation: positive signed area
            if len(h) >= 3:
                x, y = h[:, 0].astype(object), h[:, 1].astype(object)
                signed = sum(x * np.roll(y, -1) - np.roll(x, -1) * y)
                assert signed > 0

    def test_collinear_and_degenerate(self):
        line = np.array([[0, 0], [5, 5], [2, 2], [9, 9]])
        h = convex_hull(line)
        assert [tuple(p) for p in h] == [(0, 0), (9, 9)]
        assert hull_area2(h) == 0
        assert len(convex_hull(np.array([[1, 2]]))) == 1

    def test_square_with_interior_and_edge_points(self):
        pts = np.array([[0, 0], [10, 0], [10, 10], [0, 10],
                        [5, 5], [5, 0], [0, 5]])   # edge-collinear dropped
        h = convex_hull(pts)
        assert {tuple(p) for p in h} == {(0, 0), (10, 0), (10, 10), (0, 10)}
        assert hull_area2(h) == 200


class TestSimplify:
    def test_straight_line_collapses(self):
        pts = np.array([[0, 0], [1, 1], [2, 2], [3, 3], [10, 10]])
        out = simplify_ring(pts, eps=0)
        assert [tuple(p) for p in out] == [(0, 0), (10, 10)]

    def test_keeps_significant_vertex(self):
        pts = np.array([[0, 0], [50, 40], [100, 0]])
        assert len(simplify_ring(pts, eps=10)) == 3
        assert len(simplify_ring(pts, eps=50)) == 2

    def test_all_dropped_points_within_eps(self):
        rng = np.random.default_rng(9)
        xs = np.arange(0, 400, 4)
        ys = rng.integers(-15, 16, size=len(xs))
        pts = np.column_stack([xs, ys])
        eps = 12
        out = simplify_ring(pts, eps)
        kept = {tuple(p) for p in out}
        assert (0, int(ys[0])) in kept and (396, int(ys[-1])) in kept
        # every dropped point is within eps of the simplified polyline
        for p in pts:
            if tuple(p) in kept:
                continue
            dmin = min(_seg_dist(p, out[i], out[i + 1])
                       for i in range(len(out) - 1))
            assert dmin <= eps + 1e-9

    def test_closed_ring_degenerate_chord(self):
        ring = np.array([[0, 0], [100, 0], [100, 100], [0, 100], [0, 0]])
        out = simplify_ring(ring, eps=5)
        assert len(out) == 5   # corners survive, endpoints kept


def _seg_dist(p, a, b):
    p, a, b = map(lambda v: np.asarray(v, dtype=float), (p, a, b))
    v = b - a
    L2 = float(v @ v)
    if L2 == 0:
        return float(np.hypot(*(p - a)))
    t = max(0.0, min(1.0, float((p - a) @ v) / L2))
    return float(np.hypot(*(p - (a + t * v))))


class TestGroupedOps:
    def test_cell_hulls(self, spark):
        from libgeodesk_spark.operators.geomops import cell_hulls
        rows = []
        rng = np.random.default_rng(5)
        for cell in (1, 2):
            for _ in range(40):
                rows.append((cell, int(rng.integers(0, 1000)),
                             int(rng.integers(0, 1000))))
        rows.append((3, 7, 7))     # single-point cell
        df = spark.createDataFrame(rows, "cell_id long, x long, y long")
        got = {r.cell_id: r for r in cell_hulls(df).collect()}
        assert got[3].n_hull == 1 and got[3].area2 == 0
        for cell in (1, 2):
            pts = np.array([(x, y) for c, x, y in rows if c == cell])
            h = convex_hull(pts)
            assert got[cell].n_hull == len(h)
            assert got[cell].area2 == hull_area2(h)
            assert got[cell].n_points == 40

    def test_simplify_rings_schema_and_values(self, spark):
        from libgeodesk_spark.operators.geomops import simplify_rings
        ring = [{"x": 0, "y": 0}, {"x": 1, "y": 1}, {"x": 2, "y": 2},
                {"x": 100, "y": 0}]
        df = spark.createDataFrame(
            [(1, ring)],
            "way_id long, ring array<struct<x:long,y:long>>")
        out = simplify_rings(df, eps=2).collect()[0]
        got = [(p["x"], p["y"]) for p in out.ring]
        assert got == [(0, 0), (2, 2), (100, 0)] or got == [(0, 0), (100, 0)]
        # exact kernel agreement
        want = simplify_ring(np.array([(0, 0), (1, 1), (2, 2), (100, 0)]), 2)
        assert got == [tuple(p) for p in want]
