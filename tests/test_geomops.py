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


class TestLambertArea:
    """Sinusoidal equal-area alternative (LambertArea.h:44-85): numpy
    mirror equality + agreement with the Mercator-scaled default within
    the default's documented mid-latitude approximation error."""

    @staticmethod
    def _numpy_mirror(ring_xy):
        import math
        W = 4294967294.9999
        R = 6371000.0
        pts = []
        for x, y in ring_xy:
            lat = math.atan(math.exp(y * 2 * math.pi / W)) * 360 / math.pi - 90
            lon = x * 360.0 / W
            px = R * math.radians(lon) * math.cos(math.radians(lat))
            py = R * math.radians(lat)
            pts.append((px, py))
        x0 = pts[0][0]
        s = 0.0
        for (ax, ay), (bx, by) in zip(pts, pts[1:]):
            s += (ax - x0) * by - (bx - x0) * ay
        return s / 2.0

    def test_matches_numpy_mirror_and_mercator_default(self, spark):
        from libgeodesk_spark.functions.geometry import (
            lambert_signed_area_m2, ring_area_m2)
        # 100km-ish square at ~45N (y≈510e6) and a tall 20x500km strip
        # (where the Mercator single-scale approximation is weakest)
        sq = [(0, 500_000_000), (3_000_000, 500_000_000),
              (3_000_000, 503_000_000), (0, 503_000_000), (0, 500_000_000)]
        tall = [(0, 400_000_000), (600_000, 400_000_000),
                (600_000, 415_000_000), (0, 415_000_000), (0, 400_000_000)]
        df = spark.createDataFrame(
            [("sq", [{"x": x, "y": y} for x, y in sq]),
             ("tall", [{"x": x, "y": y} for x, y in tall])],
            "zone string, ring array<struct<x:long,y:long>>")
        got = {r["zone"]: (r["lam"], r["merc"]) for r in df.select(
            "zone", lambert_signed_area_m2(F.col("ring")).alias("lam"),
            ring_area_m2(F.col("ring")).alias("merc")).collect()}
        for name, ring_xy in (("sq", sq), ("tall", tall)):
            lam, merc = got[name]
            want = self._numpy_mirror(ring_xy)
            assert lam == pytest.approx(want, rel=1e-12), name
            # both rings are CCW -> positive signed area
            assert lam > 0
            # the two conventions agree to ~1% on these shapes
            assert abs(lam) == pytest.approx(merc, rel=0.02), name

    def test_equator_square_is_metric(self, spark):
        """A small square at the equator must measure ~(side_m)² — the
        equal-area projection is locally metric there. The systematic
        (R_sphere/R_wgs84_equatorial)² = (6371000/6378137)² ≈ 0.99776
        offset is the REFERENCE'S own convention split: Sinusoidal.h
        assumes a 6371 km sphere while the Mercator meters scale uses
        the WGS84 equatorial circumference."""
        from libgeodesk_spark.functions.geometry import lambert_area_m2
        from libgeodesk_spark.mercator import meters_per_unit_at_y
        side_units = 100_000
        side_m = side_units * meters_per_unit_at_y(0)
        ring = [(0, 0), (side_units, 0), (side_units, side_units),
                (0, side_units), (0, 0)]
        df = spark.createDataFrame(
            [([{"x": x, "y": y} for x, y in ring],)],
            "ring array<struct<x:long,y:long>>")
        got = df.select(lambert_area_m2(F.col("ring")).alias("a")) \
            .first()["a"]
        sphere_ratio = (6371000.0 / 6378137.0) ** 2
        assert got == pytest.approx(side_m * side_m * sphere_ratio,
                                    rel=1e-4)
