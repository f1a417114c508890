"""Topology joins, streaming ingest, and output sinks."""

import json
import os
import time

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def membership(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return li.select(F.col("l_orderkey").alias("rel_id"),
                     (F.col("l_orderkey") * 8 + F.col("l_linenumber"))
                     .alias("member_id"),
                     F.col("l_linenumber").cast("string").alias("role")).distinct()


class TestTopology:
    def test_members_of(self, membership):
        from libgeodesk_spark.operators.topology import members_of
        rel_ids = [r.rel_id for r in membership.select("rel_id").distinct()
                   .orderBy("rel_id").limit(3).collect()]
        got = members_of(membership, rel_ids).toPandas()
        assert set(got.rel_id) == set(rel_ids)
        assert got.member_id.is_unique

    def test_members_of_with_roles(self, membership):
        from libgeodesk_spark.operators.topology import members_of
        rel_ids = [r.rel_id for r in membership.select("rel_id").distinct()
                   .limit(5).collect()]
        got = members_of(membership, rel_ids, roles=["1", "2"]).toPandas()
        assert set(got.role) <= {"1", "2"}

    def test_parents_of(self, membership):
        from libgeodesk_spark.operators.topology import parents_of
        some = membership.limit(4).collect()
        got = parents_of(membership, [r.member_id for r in some]).toPandas()
        want = {(r.member_id, r.rel_id) for r in some}
        assert want <= set(map(tuple, got[["member_id", "rel_id"]].values.tolist()))

    def test_connected_to(self, spark):
        from libgeodesk_spark.functions.cells import vertex_key
        from libgeodesk_spark.operators.topology import (
            connected_to,
            parent_ways_of_vertex,
        )
        rows = [  # two ways sharing vertex (10, 10); third disjoint
            ("w1", 0, 0), ("w1", 10, 10), ("w2", 10, 10), ("w2", 20, 0),
            ("w3", 5, 5), ("w3", 6, 6),
        ]
        wv = spark.createDataFrame(rows, "way_id string, x long, y long") \
            .withColumn("vkey", vertex_key(F.col("x"), F.col("y")))
        assert [r.way_id for r in connected_to(wv, "w1").collect()] == ["w2"]
        assert sorted(r.way_id for r in
                      parent_ways_of_vertex(wv, 10, 10).collect()) == ["w1", "w2"]

    NESTED = [
        # (rel_id, member_id, mtype): r1 -> {w10, r2}; r2 -> {w20, r3};
        # r3 -> {w30, r1 (CYCLE back to the root)}; r4 isolated.
        (1, 10, "way"), (1, 2, "relation"),
        (2, 20, "way"), (2, 3, "relation"),
        (3, 30, "way"), (3, 1, "relation"),
        (4, 40, "way"),
    ]

    def test_members_recursive_with_cycle(self, spark):
        """The RelatedIterator walk with a RecursionGuard: a 3-cycle of
        relations must terminate, every transitive member lands once at
        its minimum BFS depth, and the cycle edge back to the root is
        recorded as a member row but never re-expanded."""
        from libgeodesk_spark.operators.topology import members_recursive
        memb = spark.createDataFrame(
            self.NESTED, "rel_id long, member_id long, mtype string")
        got = sorted(map(tuple, members_recursive(memb, [1]).collect()))
        assert got == sorted([
            (1, 10, "way", 1), (1, 2, "relation", 1),
            (1, 20, "way", 2), (1, 3, "relation", 2),
            (1, 30, "way", 3), (1, 1, "relation", 3),  # cycle edge, guarded
        ])
        # multiple roots walk independently; the isolated relation is flat
        got4 = members_recursive(memb, [4]).collect()
        assert [tuple(r) for r in got4] == [(4, 40, "way", 1)]

    def test_members_recursive_typed_id_collision(self, spark):
        """way 5 and relation 5 are DIFFERENT members (per-type OSM id
        namespaces, the reference's typed FeatureId): both must appear in
        the closure, and relation 5 must still be expanded even when way
        5 was seen first — an id-only guard anti-joined it away and
        silently truncated the walk."""
        from libgeodesk_spark.operators.topology import members_recursive
        memb = spark.createDataFrame(
            [(1, 5, "way"), (1, 5, "relation"), (5, 99, "way")],
            "rel_id long, member_id long, mtype string")
        got = sorted(map(tuple, members_recursive(memb, [1]).collect()))
        assert got == [(1, 5, "relation", 1), (1, 5, "way", 1),
                       (1, 99, "way", 2)]

    def test_members_recursive_depth_guard(self, spark):
        from libgeodesk_spark.operators.topology import members_recursive
        memb = spark.createDataFrame(
            self.NESTED, "rel_id long, member_id long, mtype string")
        import pytest as _pt
        with _pt.raises(RuntimeError, match="max_depth"):
            members_recursive(memb, [1], max_depth=2)

    def test_relation_length_recursive(self, spark):
        """G2 through the closure: nested relation length = Σ over ALL
        transitively-reachable way members (flat one-level aggregation
        would miss w20/w30)."""
        from libgeodesk_spark.functions.geometry import way_length_cm
        from libgeodesk_spark.operators.topology import (
            relation_length_recursive, relation_ways_recursive)
        memb = spark.createDataFrame(
            self.NESTED, "rel_id long, member_id long, mtype string")
        ways = spark.createDataFrame(
            [(w, [(0, 0), (w * 1000, 0)]) for w in (10, 20, 30, 40)],
            "way_id long, ring array<struct<x: long, y: long>>")
        closure = relation_ways_recursive(memb, [1, 4]).collect()
        assert sorted((r.root_id, r.member_id) for r in closure) == \
            [(1, 10), (1, 20), (1, 30), (4, 40)]
        got = {r.root_id: r.length_cm for r in
               relation_length_recursive(memb, ways, [1, 4]).collect()}
        per_way = {r.way_id: r.l for r in ways.select(
            "way_id", way_length_cm(F.col("ring")).alias("l")).collect()}
        assert got[1] == per_way[10] + per_way[20] + per_way[30]
        assert got[4] == per_way[40]

    def test_members_recursive_random_graphs_match_bfs(self, spark):
        """Randomized (seeded) cyclic digraphs: the distributed closure
        must equal a plain-Python BFS — members at min depth, cycles
        guarded, any topology."""
        import random

        from libgeodesk_spark.operators.topology import members_recursive
        rng = random.Random(7)
        for trial in range(4):
            n_rel = rng.randint(3, 8)
            edges = []
            for r in range(n_rel):
                for _ in range(rng.randint(1, 3)):
                    # way ids OVERLAP the relation id range on purpose:
                    # OSM id namespaces are per-type (the reference's
                    # typed FeatureId), so way 3 and relation 3 coexist
                    # and the guard must key on (id, type)
                    edges.append((r, rng.randint(0, 9), "way"))
                for _ in range(rng.randint(0, 2)):
                    edges.append((r, rng.randrange(n_rel), "relation"))
            edges = sorted(set(edges))
            roots = [0, rng.randrange(n_rel)]

            # python BFS mirror with a TYPED seen-set (RecursionGuard on
            # FeatureId = type + id)
            want = set()
            for root in set(roots):
                depth = {}
                frontier = [(m, t) for rr, m, t in edges if rr == root]
                d = 1
                seen = set()
                while frontier and d <= 32:
                    nxt = []
                    for m, t in frontier:
                        if (m, t) in seen:
                            continue
                        seen.add((m, t))
                        depth[(m, t)] = d
                        if t == "relation":
                            nxt += [(m2, t2) for rr, m2, t2 in edges
                                    if rr == m]
                    frontier = nxt
                    d += 1
                want |= {(root, m, t, dd) for (m, t), dd in depth.items()}

            memb = spark.createDataFrame(
                edges, "rel_id long, member_id long, mtype string")
            got = {tuple(r) for r in
                   members_recursive(memb, sorted(set(roots))).collect()}
            assert got == want, (trial, edges, roots)

    def test_relation_area_and_centroid_recursive(self, spark):
        """G4/G5 routed through the closure: area sums transitive AREA
        members only; centroid follows the areal > lineal > bbox priority
        (Centroid.cpp:51-74) per root, matching the single-relation
        numpy kernel."""
        from libgeodesk_spark.geom.polygonize import relation_centroid
        from libgeodesk_spark.operators.topology import (
            relation_area_m2_recursive, relation_centroid_recursive)
        memb = spark.createDataFrame(
            [(1, 10, "way"), (1, 11, "way"), (1, 2, "relation"),
             (2, 20, "way"),           # nested area member
             (3, 30, "way"),           # lineal-only relation
             (4, 40, "way")],          # zero-length: bbox fallback
            "rel_id long, member_id long, mtype string")

        def ring(*pts):
            return [{"x": int(x), "y": int(y)} for x, y in pts]

        Z = 1 << 16
        sq1 = [(0, 0), (4 * Z, 0), (4 * Z, 4 * Z), (0, 4 * Z), (0, 0)]
        sq2 = [(10 * Z, 0), (12 * Z, 0), (12 * Z, 2 * Z), (10 * Z, 2 * Z),
               (10 * Z, 0)]
        line = [(0, 0), (8 * Z, 0)]
        ways = spark.createDataFrame(
            [(10, ring(*sq1), True),
             (11, ring(*line), False),
             (20, ring(*sq2), True),
             (30, ring(*line), False),
             (40, ring((5, 5), (5, 5)), False)],
            "way_id long, ring array<struct<x:long,y:long>>, "
            "is_area boolean")

        areas = {r.root_id: r.area_m2 for r in relation_area_m2_recursive(
            memb, ways, [1, 3]).collect()}
        from libgeodesk_spark.functions.geometry import ring_area_m2
        per = {r.way_id: r.a for r in ways.filter("is_area").select(
            "way_id", ring_area_m2(F.col("ring")).alias("a")).collect()}
        assert areas[1] == per[10] + per[20]   # nested sq2 counted
        assert 3 not in areas                  # lineal-only: no area row

        cents = {r.root_id: (r.centroid_x, r.centroid_y)
                 for r in relation_centroid_recursive(
                     memb, ways, [1, 3, 4]).collect()}
        import numpy as np
        want1 = relation_centroid(
            [np.array(sq1), np.array(sq2)], [np.array(line)], [],
            (0, 0, 12 * Z, 4 * Z))
        assert cents[1] == want1               # areal wins over lineal
        want3 = relation_centroid([], [np.array(line)], [],
                                  (0, 0, 8 * Z, 0))
        assert cents[3] == want3               # lineal tier
        assert cents[4] == (5, 5)              # bbox-center fallback

    def test_connected_to_relation(self, spark):
        """Relation-anchored connectedTo (ConnectedFilter.cpp:60-118):
        candidates sharing a vertex with any member way accept; the
        relation's own members are excluded; recursive=True reaches
        vertices of NESTED members."""
        from libgeodesk_spark.functions.cells import vertex_key
        from libgeodesk_spark.operators.topology import connected_to_relation
        memb = spark.createDataFrame(
            [(100, 1, "way"), (100, 101, "relation"), (101, 2, "way")],
            "rel_id long, member_id long, mtype string")
        rows = [  # way 1 touches candidate 7; nested way 2 touches 8;
            (1, 0, 0), (1, 10, 10),
            (2, 50, 50), (2, 60, 60),
            (7, 10, 10), (7, 30, 0),
            (8, 60, 60), (8, 90, 0),
            (9, 500, 500), (9, 501, 501),
        ]
        wv = spark.createDataFrame(rows, "way_id long, x long, y long") \
            .withColumn("vkey", vertex_key(F.col("x"), F.col("y")))
        flat = sorted(r.way_id for r in
                      connected_to_relation(wv, memb, 100).collect())
        assert flat == [7]
        rec = sorted(r.way_id for r in
                     connected_to_relation(wv, memb, 100,
                                           recursive=True).collect())
        assert rec == [7, 8]


class TestStreaming:
    def test_stream_within_matches_batch(self, spark, sf_dir, tmp_path):
        """Streaming PIP == batch PIP: the broadcast interval join is
        stateless, so two availableNow epochs through the parquet sink
        must land exactly the batch membership set."""
        import numpy as np

        from libgeodesk_spark.geom.zones import prepare_zone
        from libgeodesk_spark.operators.spatial_join import join_zones
        from libgeodesk_spark.sources.points import (
            GATE_ZONES, derived_points)
        from libgeodesk_spark.streaming.ingest import stream_within
        zone = prepare_zone("comb",
                            [np.array(r) for r in GATE_ZONES["comb"]])
        pts = derived_points(spark, sf_dir).select("image_id", "pid",
                                                   "x", "y")
        src, out, ck = (str(tmp_path / d) for d in ("src", "out", "ck"))
        for i, half in enumerate((pts.filter(F.col("pid") % 2 == 0),
                                  pts.filter(F.col("pid") % 2 != 0))):
            half.write.parquet(f"{src}/b{i}")
            stream = spark.readStream.schema(
                "image_id string, pid long, x long, y long") \
                .parquet(src + "/*")
            q = (stream_within(stream, [zone], columns=["image_id"])
                 .writeStream.format("parquet").option("path", out)
                 .option("checkpointLocation", ck)
                 .outputMode("append").trigger(availableNow=True).start())
            q.awaitTermination(120)
        got = sorted(r.image_id for r in spark.read.parquet(out)
                     .select("image_id").collect())
        want = sorted(r.image_id for r in
                      join_zones(pts, [zone], predicate="within",
                                 columns=["image_id"])
                      .select("image_id").collect())
        assert got == want and len(got) > 0

    def test_stream_cell_assign_matches_batch(self, spark, sf_dir, tmp_path):
        from libgeodesk_spark.sources.points import derived_points
        from libgeodesk_spark.streaming.ingest import (
            start_append_sink,
            stream_cell_assign,
        )
        pts = derived_points(spark, sf_dir).select("image_id", "x", "y")
        src = str(tmp_path / "src")
        out = str(tmp_path / "out")
        ck = str(tmp_path / "ck")
        # batch 1
        pts.filter("pid % 2 = 0" if "pid" in pts.columns else "x % 2 = 0")
        half1 = pts.filter(F.col("x") % 2 == 0)
        half2 = pts.filter(F.col("x") % 2 != 0)
        half1.write.parquet(src + "/b1")
        stream = stream_cell_assign(spark, src + "/*", "image_id string, x long, y long")
        q = start_append_sink(stream, out, ck)
        q.awaitTermination(120)
        # batch 2 arrives; availableNow trigger needs a new start
        half2.write.parquet(src + "/b2")
        q2 = start_append_sink(
            stream_cell_assign(spark, src + "/*", "image_id string, x long, y long"),
            out, ck)
        q2.awaitTermination(120)

        got = spark.read.parquet(out)
        from libgeodesk_spark.functions.cells import cell_id
        want = pts.withColumn("cell_id", cell_id(F.col("x"), F.col("y"), 12))
        assert got.count() == want.count()
        assert got.select(F.sum("cell_id")).first()[0] == \
            want.select(F.sum("cell_id")).first()[0]

    def test_windowed_counts(self, spark, tmp_path):
        import datetime
        from libgeodesk_spark.streaming.ingest import stream_cell_counts
        src = str(tmp_path / "ev")
        base = datetime.datetime(2026, 1, 1, 12, 0, 0)
        rows = [(base + datetime.timedelta(seconds=10 * i), 1000 + i, 2000)
                for i in range(12)]
        spark.createDataFrame(rows, "ts timestamp, x long, y long") \
            .write.parquet(src + "/b1")
        counts = stream_cell_counts(spark, src + "/*", "ts timestamp, x long, y long")
        q = (counts.writeStream.format("memory").queryName("cc")
             .outputMode("complete").trigger(availableNow=True).start())
        q.awaitTermination(120)
        got = spark.sql("select * from cc").toPandas()
        assert got.n.sum() == 12
        assert len(got) == 2   # two 1-minute windows


    def test_stateful_first_seen_dedup(self, spark, tmp_path):
        """applyInPandasWithState first-seen dedup: one output row per key
        across micro-batches, count of duplicates tracked in state."""
        from libgeodesk_spark.streaming.ingest import stream_first_seen
        src = str(tmp_path / "imgs")
        ck = str(tmp_path / "ck_dedup")
        rows1 = [(100, "img_b"), (100, "img_a"), (200, "img_c")]
        rows2 = [(100, "img_d"), (300, "img_e")]   # 100 is a dup of batch 1
        spark.createDataFrame(rows1, "phash long, image_id string") \
            .write.parquet(src + "/b1")
        out = str(tmp_path / "out_dedup")

        def run_epoch():
            stream = spark.readStream.schema("phash long, image_id string") \
                .parquet(src + "/*")
            q = (stream_first_seen(stream).writeStream.format("parquet")
                 .option("path", out).option("checkpointLocation", ck)
                 .outputMode("append").trigger(availableNow=True).start())
            q.awaitTermination(120)

        run_epoch()
        got1 = {r.phash: (r.image_id, r.n_dups)
                for r in spark.read.parquet(out).collect()}
        assert got1 == {100: ("img_a", 1), 200: ("img_c", 0)}
        # batch 2: key 100 must NOT re-emit (state persisted via checkpoint)
        spark.createDataFrame(rows2, "phash long, image_id string") \
            .write.parquet(src + "/b2")
        run_epoch()
        got2 = {r.phash: (r.image_id, r.n_dups)
                for r in spark.read.parquet(out).collect()}
        assert got2 == {100: ("img_a", 1), 200: ("img_c", 0),
                        300: ("img_e", 0)}


class TestSinks:
    def test_wkt_and_geojson(self, spark):
        from libgeodesk_spark.sources.sinks import (
            geojson_feature_collection,
            point_geojson,
            point_wkt,
        )
        df = spark.createDataFrame([(0, 0, "a"), (89478485, 643000000, "b")],
                                   "x long, y long, name string")
        wkt = [r[0] for r in df.select(point_wkt(F.col("x"), F.col("y"))).collect()]
        assert wkt[0] == "POINT (0.0 0.0)"
        assert wkt[1].startswith("POINT (7.5")   # 7.49999997 @1e-7 → 7.5
        gj = df.select(point_geojson(F.col("x"), F.col("y"),
                                     {"name": F.col("name")}).alias("j")).collect()
        parsed = json.loads(gj[0].j)
        assert parsed["type"] == "Feature"
        assert parsed["properties"]["name"] == "a"
        fc = json.loads(geojson_feature_collection(df, props=["name"]))
        assert fc["type"] == "FeatureCollection" and len(fc["features"]) == 2

    def test_geojsonl_and_csv_write(self, spark, tmp_path):
        from libgeodesk_spark.sources.sinks import write_csv, write_geojsonl
        df = spark.createDataFrame([(1, 2, "x"), (3, 4, "y")],
                                   "x long, y long, name string")
        gj_dir = str(tmp_path / "gj")
        write_geojsonl(df, gj_dir, props=["name"])
        lines = [json.loads(ln) for ln in spark.read.text(gj_dir)
                 .toPandas().value.tolist()]
        assert {ln["properties"]["name"] for ln in lines} == {"x", "y"}
        csv_dir = str(tmp_path / "csv")
        write_csv(df, csv_dir, ["name", "x"])
        back = spark.read.option("header", True).csv(csv_dir).toPandas()
        assert list(back.columns) == ["name", "x"]
        assert sorted(back.name) == ["x", "y"]

    def test_ring_wkt(self, spark):
        from libgeodesk_spark.sources.points import zones_df
        from libgeodesk_spark.sources.sinks import ring_wkt
        z = zones_df(spark).limit(1)
        w = z.select(ring_wkt(F.col("ring")).alias("w")).first().w
        assert w.startswith("POLYGON ((") and w.endswith("))")
        assert w.count(",") >= 3

    def test_leaflet_map(self, spark, tmp_path):
        import json as _json
        from libgeodesk_spark.sources.sinks import write_leaflet_map
        df = spark.createDataFrame([(89478485, 643000000, "a")],
                                   "x long, y long, name string")
        out = str(tmp_path / "map.html")
        write_leaflet_map(df, out, props=["name"])
        html = open(out).read()
        assert html.startswith("<!DOCTYPE html>")
        assert "L.geoJSON" in html and "FeatureCollection" in html
        # the embedded GeoJSON is valid JSON
        start = html.index('{"type":"FeatureCollection"')
        depth = 0
        for i, ch in enumerate(html[start:], start):
            depth += ch == "{"
            depth -= ch == "}"
            if depth == 0:
                _json.loads(html[start:i + 1])
                break


def test_nodes_of_anonymous_synthesis(spark):
    """T2: way vertices merge with stored feature nodes by exact coord;
    unmatched vertices come back as anonymous rows with NULL node_id
    (FeatureIteratorBase.cpp:233-261)."""
    from libgeodesk_spark.operators.topology import nodes_of
    ways = spark.createDataFrame(
        [(1, [{"x": 10, "y": 10}, {"x": 20, "y": 20}, {"x": 30, "y": 30}])],
        "way_id long, ring array<struct<x:long,y:long>>")
    nodes = spark.createDataFrame(
        [(101, 10, 10), (103, 30, 30), (999, 77, 77)],
        "node_id long, x long, y long")
    rows = nodes_of(ways, nodes).collect()
    assert [(r.seq, r.x, r.node_id) for r in rows] == [
        (0, 10, 101), (1, 20, None), (2, 30, 103)]


class TestGeoJsonReader:
    def test_point_round_trip_within_one_unit(self, spark, tmp_path):
        """sink -> reader reproduces int Mercator coords within +-1 unit
        (the 100-nanodegree text precision both we and the reference
        emit is coarser than one unit — documented contract)."""
        from libgeodesk_spark.sources.geojson import read_geojsonl
        from libgeodesk_spark.sources.sinks import write_geojsonl
        rows = [(0, 0, "o"), (89478485, 643000000, "a"),
                (-120000000, -45000000, "b"), (2147480000, 900000000, "c")]
        df = spark.createDataFrame(rows, "x long, y long, name string")
        gj = str(tmp_path / "gj")
        write_geojsonl(df, gj, props=["name"])
        back = read_geojsonl(spark, gj).toPandas()
        assert set(back.geom_type) == {"Point"}
        want = {n: (x, y) for x, y, n in rows}
        for _, r in back.iterrows():
            wx, wy = want[r.properties["name"]]
            assert abs(r.x - wx) <= 1 and abs(r.y - wy) <= 1

    def test_polygon_and_mixed_lines(self, spark, tmp_path):
        from libgeodesk_spark.sources.geojson import read_geojsonl
        poly = ('{"type":"Feature","geometry":{"type":"Polygon",'
                '"coordinates":[[[0.0,0.0],[1.0,0.0],[1.0,1.0],[0.0,0.0]]]},'
                '"properties":{"name":"tri"}}')
        pt = ('{"type":"Feature","geometry":{"type":"Point",'
              '"coordinates":[1.0,1.0]},"properties":{"name":"p"}}')
        ls = ('{"type":"Feature","geometry":{"type":"LineString",'
              '"coordinates":[[0.0,0.0],[1.0,1.0]]},"properties":{}}')
        src = tmp_path / "mixed"
        src.mkdir()
        (src / "part-0.txt").write_text("\n".join([poly, pt, ls]) + "\n")
        back = read_geojsonl(spark, str(src)).toPandas()
        by_type = {r.geom_type: r for _, r in back.iterrows()}
        assert set(by_type) == {"Polygon", "Point", "LineString"}
        tri = by_type["Polygon"].rings
        assert len(tri) == 1 and len(tri[0]) == 4
        # 1 degree lon = 2^32/360 units
        assert tri[0][1]["x"] == round((1 << 32) / 360)
        assert by_type["Point"].x == round((1 << 32) / 360)
        assert by_type["LineString"].rings is None
        import pandas as pd
        assert pd.isna(by_type["LineString"].x)


class TestStreamRangeJoin:
    def test_cross_epoch_matches(self, spark, tmp_path):
        """Pairs split across availableNow epochs match through
        checkpointed join state; result equals the batch range join."""
        import datetime

        from libgeodesk_spark.streaming.ingest import stream_range_join
        base = datetime.datetime(2026, 1, 1, 12, 0, 0)

        def ts(mins):
            return base + datetime.timedelta(minutes=mins)

        # (event_id, user, ts): purchase 1 matches views 10/11 (within
        # 60 min); purchase 2 has no view in range; the matching view 11
        # arrives in the SECOND epoch, after its purchase
        purchases = [(1, 7, ts(100)), (2, 7, ts(300))]
        views = [(10, 7, ts(50)), (11, 7, ts(90)), (12, 7, ts(170))]
        lsrc, rsrc = str(tmp_path / "l"), str(tmp_path / "r")
        out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
        sch = "event_id long, user_id long, ts timestamp"

        def epoch(p_rows, v_rows, sub):
            from pyspark.sql import functions as F
            spark.createDataFrame(p_rows, sch).write.parquet(f"{lsrc}/{sub}")
            spark.createDataFrame(v_rows, sch).write.parquet(f"{rsrc}/{sub}")
            l = spark.readStream.schema(sch).parquet(lsrc + "/*")
            r = spark.readStream.schema(sch).parquet(rsrc + "/*")
            j = stream_range_join(l, r, "user_id", window="60 minutes") \
                .select(F.col("l.event_id").alias("p_id"),
                        F.col("r.event_id").alias("v_id"))
            q = (j.writeStream.format("parquet").option("path", out)
                 .option("checkpointLocation", ck)
                 .outputMode("append").trigger(availableNow=True).start())
            q.awaitTermination(120)

        epoch([purchases[0]], [views[0]], "b1")
        epoch([purchases[1]], views[1:], "b2")
        got = {(r.p_id, r.v_id) for r in spark.read.parquet(out).collect()}
        assert got == {(1, 10), (1, 11)}   # 11 matched across epochs
