"""Engine-vs-oracle tests for the broadcast spatial join and kNN.

The oracle is the numpy kernel applied directly (brute force, no cover) —
the engine must reproduce its membership sets exactly, the golden-dump
device of the reference's own tests (test/Features_test.cpp:75-123).
"""

import numpy as np
import pytest

from libgeodesk_spark.geom import kernel
from libgeodesk_spark.geom.zones import prepare_zone
from libgeodesk_spark.operators.knn import knn, max_meters_from, radius_units
from libgeodesk_spark.operators.spatial_join import join_zones
from libgeodesk_spark.sources.points import (
    GATE_ZONES,
    derived_points,
)


@pytest.fixture(scope="module")
def points(spark, sf_dir):
    df = derived_points(spark, sf_dir)
    df.persist()
    df.count()
    return df


@pytest.fixture(scope="module")
def points_pd(points):
    return points.select("image_id", "x", "y").toPandas().sort_values("image_id")


@pytest.fixture(scope="module")
def zones():
    return {name: prepare_zone(name, [np.array(r) for r in rings])
            for name, rings in GATE_ZONES.items()}


@pytest.mark.parametrize("zname", ["convex", "comb", "holed"])
@pytest.mark.parametrize("predicate", ["within", "intersects"])
def test_join_matches_brute_force(points, points_pd, zones, zname, predicate):
    z = zones[zname]
    got = (join_zones(points, [z], predicate=predicate)
           .select("image_id").toPandas()["image_id"].tolist())
    loc = kernel.locate_points(points_pd.x.to_numpy(), points_pd.y.to_numpy(),
                               z.edges)
    min_loc = kernel.INSIDE if predicate == "within" else kernel.BOUNDARY
    want = points_pd.image_id.to_numpy()[loc >= min_loc].tolist()
    assert sorted(got) == sorted(want)
    assert len(want) > 0, "fixture must be non-trivial"


def test_join_multi_zone(points, points_pd, zones):
    zs = list(zones.values())
    got = (join_zones(points, zs, predicate="within")
           .groupBy("zone_id").count().toPandas())
    for _, row in got.iterrows():
        z = zones[row.zone_id]
        loc = kernel.locate_points(points_pd.x.to_numpy(),
                                   points_pd.y.to_numpy(), z.edges)
        assert row["count"] == int((loc == 1).sum())


def test_knn_matches_brute(points, points_pd):
    from libgeodesk_spark.sources.points import X0, Y0
    qx, qy = X0 + 4_000_000, Y0 + 4_000_000
    for k in (1, 5, 50):
        got = knn(points, qx, qy, k).toPandas()
        dx = points_pd.x.to_numpy().astype(np.int64) - qx
        dy = points_pd.y.to_numpy().astype(np.int64) - qy
        sq = dx * dx + dy * dy
        order = sorted(zip(sq, points_pd.image_id))[:k]
        assert list(got.image_id) == [i for _, i in order]
        assert list(got.sq_dist) == [int(s) for s, _ in order]


def test_knn_in_hot_cell(points, points_pd):
    # query inside the hot cell: dense candidates, ring 0 should suffice
    from libgeodesk_spark.sources.points import HOT_X_OFF, HOT_Y_OFF, X0, Y0
    qx, qy = X0 + HOT_X_OFF + 2000, Y0 + HOT_Y_OFF + 2000
    got = knn(points, qx, qy, 10).toPandas()
    dx = points_pd.x.to_numpy().astype(np.int64) - qx
    dy = points_pd.y.to_numpy().astype(np.int64) - qy
    sq = dx * dx + dy * dy
    order = sorted(zip(sq, points_pd.image_id))[:10]
    assert list(got.image_id) == [i for _, i in order]


def test_radius_exact(points, points_pd):
    from libgeodesk_spark.sources.points import X0, Y0
    qx, qy = X0 + 2_000_000, Y0 + 5_000_000
    got = radius_units(points, qx, qy, 500_000**2).select("image_id").toPandas()
    dx = points_pd.x.to_numpy().astype(np.int64) - qx
    dy = points_pd.y.to_numpy().astype(np.int64) - qy
    want = points_pd.image_id.to_numpy()[dx * dx + dy * dy <= 500_000**2]
    assert sorted(got.image_id) == sorted(want)


def test_max_meters_from(points, points_pd):
    from libgeodesk_spark.mercator import units_from_meters
    from libgeodesk_spark.sources.points import X0, Y0
    qx, qy = X0 + 4_000_000, Y0 + 2_000_000
    got = max_meters_from(points, 5000.0, qx, qy).select("image_id").toPandas()
    u = units_from_meters(5000.0, qy)
    dx = points_pd.x.to_numpy().astype(np.float64) - qx
    dy = points_pd.y.to_numpy().astype(np.float64) - qy
    want = points_pd.image_id.to_numpy()[dx * dx + dy * dy <= u * u]
    assert sorted(got.image_id) == sorted(want)
