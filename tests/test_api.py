"""Fluent Features facade tests — the reference's README example shape."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from libgeodesk_spark.api import Features
from libgeodesk_spark.geom.zones import prepare_zone
from libgeodesk_spark.sources.points import GATE_ZONES, X0, Y0, derived_points


@pytest.fixture(scope="module")
def world(spark, sf_dir):
    df = derived_points(spark, sf_dir) \
        .withColumn("fmt", F.when(F.col("pid") % 10 < 4, "png")
                    .when(F.col("pid") % 10 < 8, "jpeg").otherwise("bmp"))
    df.persist().count()
    return Features(df)


@pytest.fixture(scope="module")
def comb():
    return prepare_zone("comb", [np.array(r) for r in GATE_ZONES["comb"]])


def test_fluent_chain(world, comb):
    # the README.md:92-103 shape: query -> bbox -> spatial filter -> count
    pngs = world("*[fmt=png]")
    boxed = pngs.bbox(X0, Y0, X0 + 8_000_000, Y0 + 8_000_000)
    inside = boxed.within(comb)
    n = inside.count()
    assert 0 < n < world.count()
    # equivalent direct computation
    from libgeodesk_spark.geom import kernel
    pdf = world.df.filter("fmt = 'png'").select("x", "y").toPandas()
    loc = kernel.locate_points(pdf.x.to_numpy(), pdf.y.to_numpy(), comb.edges)
    assert n == int((loc == 1).sum())


def test_within_accepts_wkt_and_wkb(world, comb):
    """geodesk-py filters take any GEOS-readable geometry; here WKT text
    and WKB bytes prepare on the fly and match the PreparedZone path."""
    from libgeodesk_spark.geom.wkb import _merc_rings_to_lonlat, rings_to_wkb
    rings = [np.array(r, dtype=np.int64) for r in GATE_ZONES["comb"]]
    want = world.within(comb).count()
    wkb = rings_to_wkb(rings, merc=True)
    assert world.within(wkb).count() == want
    lonlat = _merc_rings_to_lonlat(rings)
    wkt = "POLYGON ((" + ", ".join(
        f"{lo!r} {la!r}" for lo, la in lonlat[0]) + "))"
    assert world.within(wkt).count() == want


def test_terminals(world):
    assert not world.is_empty()
    assert bool(world)
    assert world.first() is not None
    empty = world.filter(F.lit(False))
    assert empty.is_empty() and not bool(empty)
    assert empty.first() is None
    with pytest.raises(ValueError, match="one"):
        world.one()
    single = world.filter(F.col("pid") == world.first().pid)
    assert single.one().pid == world.first().pid


def test_callable_filter(world):
    # P12: arbitrary predicate as a vectorized callable over Arrow batches
    got = world.filter(lambda pdf: pdf.salt == 3).count()
    want = world.df.filter("salt = 3").count()
    assert got == want > 0


def test_nearest_and_radius(world):
    got = world.nearest(X0 + 4_000_000, Y0 + 4_000_000, 5)
    assert got.count() == 5
    r = world.max_meters_from(3000.0, X0 + 4_000_000, Y0 + 4_000_000)
    assert r.count() >= 0


def test_geojson_and_wkt(world):
    import json
    fc = json.loads(world.filter(F.col("salt") == 3).to_geojson(
        props=["image_id"], limit=5))
    assert fc["type"] == "FeatureCollection"
    assert len(fc["features"]) == 5
    w = world.df.select(world.wkt().alias("w")).first().w
    assert w.startswith("POINT (")


class TestPipelineSurface:
    def test_phash_snapshot_geojsonl_round(self, spark, tmp_path):
        """Fluent surface over the session's new operators: snapshot
        commit/read, phash near-dups, GeoJSONL read-back."""
        from libgeodesk_spark.api import Features
        rows = [(f"img{i:03d}", 1000 + i, 2000 + i, 7 + i, (i << 8) | 1)
                for i in range(20)]
        rows.append(("img_tw", 1500, 2500, 7, (3 << 8) | 3))  # ham-1 twin of img003
        df = spark.createDataFrame(
            rows, "image_id string, x long, y long, cell_id long, phash long")
        f = Features(df)
        snap = str(tmp_path / "t")
        assert f.to_snapshot(snap) == 1
        back = Features.from_snapshot(spark, snap)
        assert back.count() == 21
        pairs = {(r.id_a, r.id_b) for r in
                 f.near_dups_by_phash(max_hamming=1).collect()}
        assert ("img003", "img_tw") in pairs
        gj = str(tmp_path / "gj")
        f.to_geojsonl(gj, props=["image_id"])
        assert Features.from_geojsonl(spark, gj).count() == 21

    def test_spatial_pair_surface(self, spark):
        from libgeodesk_spark.api import Features
        df = spark.createDataFrame(
            [(1, 0, 0, 9), (2, 10, 0, 9), (3, 0, 12, 9), (4, 500, 500, 9)],
            "pid long, x long, y long, cell_id long")
        f = Features(df)
        nn = f.knn_join(1).toPandas()
        assert dict(zip(nn.id_a, nn.id_b)) == {1: 2, 2: 1, 3: 1, 4: 3}
        pw = f.pairs_within(16).toPandas()
        assert sorted(zip(pw.id_a, pw.id_b)) == [(1, 2), (1, 3), (2, 3)]
        h = f.cell_hulls().toPandas()
        assert h.n_points.sum() == 4


def test_ways_fluent_surface(spark):
    """Ways fluent wrapper: within/intersecting/crossing/max_meters_from
    chain and agree with the underlying way_join operators."""
    import numpy as np

    from libgeodesk_spark.api import Ways
    from libgeodesk_spark.geom.zones import prepare_zone
    Z = 1 << 16
    s = 4 * Z
    zone = prepare_zone("sq", [np.array(
        [[0, 0], [s, 0], [s, s], [0, s], [0, 0]], dtype=np.int64)])

    def ring(*pts):
        pts = list(pts) + [pts[0]]
        return [{"x": int(x), "y": int(y)} for x, y in pts]

    rows = [
        ("inside", ring((Z, Z), (2 * Z, Z), (2 * Z, 2 * Z)), True),
        ("partial", ring((2 * Z, 2 * Z), (6 * Z, 2 * Z))[:-1], False),
        ("outside", ring((6 * Z, 6 * Z), (7 * Z, 6 * Z), (7 * Z, 7 * Z)),
         True),
    ]
    w = Ways(spark.createDataFrame(
        rows, "way_id string, ring array<struct<x:long,y:long>>, "
              "is_area boolean"))
    assert w.within(zone).ids() == ["inside"]
    assert w.intersecting(zone).ids() == ["inside", "partial"]
    assert w.crossing(zone).ids() == ["partial"]
    # chain: intersecting then crossing narrows to the boundary-crosser
    assert w.intersecting(zone).crossing(zone).ids() == ["partial"]
    assert w.max_meters_from(1e9, Z, Z).count() == 3
    # terminal geometry with the reference unit table
    lens = {r[0]: r[1] for r in w.length("km").collect()}
    assert lens["partial"] > 0
    mi = {r[0]: r[1] for r in w.length("mi").collect()}
    assert mi["partial"] == lens["partial"] / 0.001 * 0.0006213711922373339
    areas = {r[0]: r[1] for r in w.area_m2().collect()}
    assert set(areas) == {"inside", "outside"} and areas["inside"] > 0
    lamb = {r[0]: r[1] for r in w.area_m2(lambert=True).collect()}
    # the two conventions agree to ~1% on small near-equator rings
    assert abs(lamb["inside"] / areas["inside"] - 1) < 0.01
