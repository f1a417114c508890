"""Way-candidate predicate tests — the reference's semantic landmines:
boundary-only linestrings, equal polygons (issue #57), containment both
directions (WithinFilter.cpp:21-57, IntersectsFilter.cpp:36-75)."""

import numpy as np
import pytest

from libgeodesk_spark.geom.zones import prepare_zone
from libgeodesk_spark.operators.way_join import way_intersects, way_within

Z = 1 << 16


@pytest.fixture(scope="module")
def zone():
    s = 4 * Z
    ring = np.array([[0, 0], [s, 0], [s, s], [0, s], [0, 0]], dtype=np.int64)
    return prepare_zone("sq", [ring])


def ring_pts(*pts):
    pts = list(pts)
    if pts[0] != pts[-1]:
        pts.append(pts[0])
    return [{"x": int(x), "y": int(y)} for x, y in pts]


@pytest.fixture(scope="module")
def ways(spark, zone):
    s = 4 * Z
    rows = [
        # fully inside area
        ("inside_area", ring_pts((Z, Z), (2 * Z, Z), (2 * Z, 2 * Z), (Z, 2 * Z)), True),
        # line inside
        ("inside_line", ring_pts((Z, Z), (2 * Z, 2 * Z))[:-1], False),
        # sticking out
        ("partial", ring_pts((2 * Z, 2 * Z), (6 * Z, 2 * Z))[:-1], False),
        # fully outside
        ("outside", ring_pts((6 * Z, 6 * Z), (7 * Z, 6 * Z), (7 * Z, 7 * Z)), True),
        # EQUAL polygon: all vertices on boundary, centroid inside -> within
        ("equal_poly", ring_pts((0, 0), (s, 0), (s, s), (0, s)), True),
        # linestring lying entirely ON the boundary: NOT within, intersects
        ("boundary_line", ring_pts((0, 0), (s, 0))[:-1], False),
        # area candidate that CONTAINS the zone: intersects, not within
        ("contains_zone", ring_pts((-s, -s), (2 * s, -s), (2 * s, 2 * s), (-s, 2 * s)), True),
        # disjoint ring around the zone? (donut effect impossible w/ single ring)
        ("touching_corner", ring_pts((s, s), (2 * s, s), (2 * s, 2 * s), (s, 2 * s)), True),
    ]
    return spark.createDataFrame(
        rows, "way_id string, ring array<struct<x:long,y:long>>, is_area boolean")


def ids(df):
    return sorted(r.way_id for r in df.collect())


def test_way_within(ways, zone):
    got = ids(way_within(ways, zone))
    # equal polygons are within each other (issue #57); boundary-only
    # linestrings are not; partial/outside/containing are not
    assert got == ["equal_poly", "inside_area", "inside_line"]


def test_way_intersects(ways, zone):
    got = ids(way_intersects(ways, zone))
    # everything except the fully-outside ring
    assert got == ["boundary_line", "contains_zone", "equal_poly",
                   "inside_area", "inside_line", "partial", "touching_corner"]
