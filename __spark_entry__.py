"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship spatial join at sf0.001.
``queries()`` — one entry per implemented operator (SURVEY.md §2).
``oracle_sql()`` — DuckDB-equivalent SQL for the correctness gate.

Exactness design: spatial queries run over points derived from lineitem
keys with pure integer LCG arithmetic (libgeodesk_spark/sources/points.py)
so Spark and DuckDB materialize bit-identical inputs; all gate outputs are
integers/strings (no cross-engine float hashing).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# lazily import the engine (keeps module import cheap for the driver)
# ---------------------------------------------------------------------------

def _zones():
    import numpy as np

    from libgeodesk_spark.geom.zones import prepare_zone
    from libgeodesk_spark.sources.points import GATE_ZONES
    return {name: prepare_zone(name, [np.array(r) for r in rings])
            for name, rings in GATE_ZONES.items()}


_ZONE_CACHE: dict = {}


def _zone(name):
    if not _ZONE_CACHE:
        _ZONE_CACHE.update(_zones())
    return _ZONE_CACHE[name]


# --- gate constants (embedded in both Spark + SQL) -------------------------

KNN_Q = (93_000_000, 644_000_000)        # inside the window
RADIUS_Q = (91_000_000, 645_000_000)
RADIUS_SQ = 500_000 ** 2
BBOX = (90_000_000, 642_000_000, 94_000_000, 646_000_000)
HOT_THRESHOLD = 50                        # cells with ≥50 points (hot + none)
# snapshot_scan: a cell_id band covering the middle rows of the window
# (zoom-12 cell ids are (12<<24) + row*4096 + col; rows ~1429..1437 here)
SNAP_CELL_RANGE = ((12 << 24) + 1430 * 4096, (12 << 24) + 1433 * 4096 + 4095)
# stream_window_counts: fixed event-time base (2026-01-01 12:00:00 UTC)
WM_BASE_EPOCH = 1767268800
NEAR_PAIRS_R = 32   # units; output dominated by the hot block (~8k pairs)

#: contains_point probes: tooth interior, notch, on the tooth wall,
#: outside the window, exactly on a ring vertex
PROBES = [
    ("p_tooth", 89_000_000 + 1_500_000, 640_000_000 + 4_000_000),
    ("p_notch", 89_000_000 + 2_500_000, 640_000_000 + 4_000_000),
    ("p_wall", 89_000_000 + 2_000_000, 640_000_000 + 4_000_000),
    ("p_out", 89_000_000 - 5_000_000, 640_000_000),
    ("p_vertex", 89_000_000 + 1_000_000, 640_000_000 + 1_000_000),
]

PYRAMID_LEVELS = (0, 2, 4, 6, 8, 10, 12)


# ---------------------------------------------------------------------------
# entry
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: point-in-polygon join (comb zone) over sf0.001 points."""
    return _q_within("comb")(spark, "/root/testdata/sf0.001")


# ---------------------------------------------------------------------------
# Spark queries
# ---------------------------------------------------------------------------

# Pinned quality floors for the approximate paths (BENCH/ANN.md measured
# values on the seeded gate corpora; BASELINE.md PSNR north-star). The
# rows-only gate queries SELF-ASSERT against these — the analog of the
# reference's golden-dump diffing (test/Features_test.cpp:75-123): a
# silent recall/fidelity collapse raises, so the driver records `err`
# instead of green.
RECALL_FLOORS_D64 = {"lsh": 92, "ivf": 94}
RECALL_FLOORS_D256 = {"lsh": 100, "ivf": 100}
PSNR_FLOOR_DB = 40.0


def _assert_recall_floor(df: DataFrame, floors: dict[str, int]) -> DataFrame:
    """Raise when any method's recall@k lands under its pinned floor —
    the metric row is tiny (one row per method), so the extra driver
    collect is free; the returned DataFrame is unchanged."""
    rows = {r["method"]: r["recall_pct"] for r in df.collect()}
    for method, floor in floors.items():
        got = rows.get(method)
        if got is None or got < floor:
            raise AssertionError(
                f"ann recall gate: {method} recall@10 = {got} < pinned "
                f"floor {floor} (BENCH/ANN.md) — approximate path regressed")
    return df


def _points(spark, sf_dir):
    from libgeodesk_spark.sources.points import derived_points
    return derived_points(spark, sf_dir)


def _q_cell_assign(spark, sf_dir):
    return _points(spark, sf_dir).select("image_id", "x", "y", "cell_id", "salt")


def _q_cell_pyramid(spark, sf_dir):
    from libgeodesk_spark.functions.cells import cell_id as cell_col
    pts = _points(spark, sf_dir)
    levels = F.array(*[
        F.struct(F.lit(z).alias("zoom"),
                 cell_col(F.col("x"), F.col("y"), z).alias("cell"))
        for z in PYRAMID_LEVELS])
    return (pts.select(F.explode(levels).alias("lc"))
            .select(F.col("lc.zoom").alias("zoom"), F.col("lc.cell").alias("cell"))
            .groupBy("zoom", "cell").agg(F.count("*").alias("n")))


def _q_bbox(spark, sf_dir):
    from libgeodesk_spark.operators.spatial_join import bbox_filter
    mnx, mny, mxx, mxy = BBOX
    return bbox_filter(_points(spark, sf_dir), mnx, mny, mxx, mxy) \
        .select("image_id", "cell_id")


def _q_within(zname):
    def q(spark, sf_dir):
        from libgeodesk_spark.operators.spatial_join import join_zones
        return join_zones(_points(spark, sf_dir), [_zone(zname)],
                          predicate="within", columns=["image_id", "cell_id"],
                          single_pass=True).select("image_id", "cell_id")
    return q


def _q_intersects(zname):
    def q(spark, sf_dir):
        from libgeodesk_spark.operators.spatial_join import join_zones
        return join_zones(_points(spark, sf_dir), [_zone(zname)],
                          predicate="intersects", columns=["image_id", "cell_id"],
                          single_pass=True).select("image_id", "cell_id")
    return q


def _q_contains_point(spark, sf_dir):
    from libgeodesk_spark import mercator
    from libgeodesk_spark.operators.spatial_join import join_zones
    rows = [(pid, x, y, int(mercator.cell_id(x, y, 12))) for pid, x, y in PROBES]
    probes = spark.createDataFrame(rows, "probe_id string, x long, y long, cell_id long")
    return join_zones(probes, [_zone("comb")], predicate="contains_point",
                      prefilter_bbox=False,
                      columns=["probe_id"]).select("probe_id")


def _q_knn(k):
    def q(spark, sf_dir):
        from libgeodesk_spark.operators.knn import knn
        return knn(_points(spark, sf_dir), KNN_Q[0], KNN_Q[1], k) \
            .select("image_id", "sq_dist")
    return q


def _q_radius(spark, sf_dir):
    from libgeodesk_spark.operators.knn import radius_units, sq_dist_col
    return radius_units(_points(spark, sf_dir), RADIUS_Q[0], RADIUS_Q[1], RADIUS_SQ) \
        .select("image_id",
                sq_dist_col("x", "y", RADIUS_Q[0], RADIUS_Q[1]).alias("sq_dist"))


def _q_tile_stats(spark, sf_dir):
    return (_points(spark, sf_dir).groupBy("cell_id")
            .agg(F.count("*").alias("n"),
                 F.min("x").alias("min_x"), F.max("x").alias("max_x"),
                 F.min("y").alias("min_y"), F.max("y").alias("max_y"),
                 F.sum(F.col("phash") % 997).alias("phash_sum")))


def _q_hot_cells(spark, sf_dir):
    return (_points(spark, sf_dir).groupBy("cell_id")
            .agg(F.count("*").alias("n")).filter(F.col("n") >= HOT_THRESHOLD))


def _q_colocated(spark, sf_dir):
    # vertex-equality style join demo (connectedTo analog, ConnectedFilter.cpp):
    # quantize to a 256-unit grid and report buckets with >= 2 points
    pts = _points(spark, sf_dir)
    return (pts.select(F.shiftright(F.col("x"), 8).alias("gx"),
                       F.shiftright(F.col("y"), 8).alias("gy"))
            .groupBy("gx", "gy").agg(F.count("*").alias("n"))
            .filter(F.col("n") >= 2))


def _q_tpch_q1(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    # midday literal: all data timestamps are at midnight, so the selected
    # row set is invariant to the (unknown) driver session timezone
    return (li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 12:00:00"))
            .groupBy("l_returnflag", "l_linestatus")
            .agg(F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
                 F.sum(F.round(F.col("l_extendedprice") * 100).cast("long"))
                  .alias("sum_base_price_cents"),
                 F.count("*").alias("count_order")))


def _q_events_by_type(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return (ev.groupBy("event_type")
            .agg(F.count("*").alias("n"),
                 F.sum(F.round(F.col("value") * 100).cast("long")).alias("value_cents"),
                 F.countDistinct("user_id").alias("n_users")))


def _q_orders_by_segment(spark, sf_dir):
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    return (o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
            .groupBy("c_mktsegment")
            .agg(F.count("*").alias("n_orders"),
                 F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
                  .alias("total_cents")))


# --- crossing segments (J4), cell ring, embedding near-dup -----------------

def _q_crosses(spark, sf_dir):
    """Segments (consecutive pids) that cross the comb zone boundary —
    the `crossing(f)` analog (CrossesFilter.cpp:10-41) through the
    cover-pruned path: only segments whose bbox touches a BOUNDARY cover
    cell reach the Arrow kernel."""
    from libgeodesk_spark.operators.spatial_join import crossing_segments
    pts = _points(spark, sf_dir).select("pid", "x", "y")
    a, b = pts.alias("a"), pts.alias("b")
    seg = a.join(b, F.col("b.pid") == F.col("a.pid") + 1) \
        .select(F.col("a.pid").alias("seg_id"),
                F.col("a.x").alias("x1"), F.col("a.y").alias("y1"),
                F.col("b.x").alias("x2"), F.col("b.y").alias("y2"))
    return crossing_segments(seg, [_zone("comb")]).select("seg_id")


# --- way / relation candidate predicates (J1/J2 for stored ways, J5 ways,
# --- MUST_ACCEPT_ALL_MEMBERS relations) -------------------------------------

WAY_DIST_METERS = 20_000.0


def _ways(spark, sf_dir):
    from libgeodesk_spark.sources.points import derived_ways
    return derived_ways(spark, sf_dir)


def _q_way_within(spark, sf_dir):
    from libgeodesk_spark.operators.way_join import way_within
    return way_within(_ways(spark, sf_dir), _zone("comb")).select("way_id")


def _q_way_intersects(spark, sf_dir):
    from libgeodesk_spark.operators.way_join import way_intersects
    return way_intersects(_ways(spark, sf_dir), _zone("comb")).select("way_id")


def _members(spark, sf_dir):
    """Gate relations: rel_id = way_id, members = the way's consecutive
    2-vertex segments — every relation has >= 1 member sticking out or in,
    exercising MUST_ACCEPT_ALL_MEMBERS (locateMembers) for real."""
    w = _ways(spark, sf_dir)
    seg = F.explode(F.transform(
        F.sequence(F.lit(1), F.size("ring") - 1),
        lambda i: F.struct(
            i.alias("member_id"),
            F.array(F.element_at("ring", i),
                    F.element_at("ring", i + 1)).alias("ring"))))
    return (w.select(F.col("way_id").alias("rel_id"), seg.alias("m"))
            .select("rel_id", F.col("m.member_id").alias("member_id"),
                    F.col("m.ring").alias("ring"), F.lit(False).alias("is_area")))


def _q_rel_within(spark, sf_dir):
    from libgeodesk_spark.operators.way_join import rel_within
    return rel_within(_members(spark, sf_dir), [_zone("comb")]) \
        .select("rel_id")


def _q_rel_intersects(spark, sf_dir):
    from libgeodesk_spark.operators.way_join import rel_intersects
    return rel_intersects(_members(spark, sf_dir), [_zone("comb")]) \
        .select("rel_id")


def _q_way_distance(spark, sf_dir):
    from libgeodesk_spark.operators.way_join import way_max_meters_from
    return way_max_meters_from(_ways(spark, sf_dir), WAY_DIST_METERS,
                               KNN_Q[0], KNN_Q[1]).select("way_id", "d2")


def _q_nodes_of(spark, sf_dir):
    """T2 nodesOf with anonymous-node synthesis: stored feature nodes are
    the pid%3==0 points; every other way vertex synthesizes a NULL-id row
    (FeatureIteratorBase.cpp:233-261)."""
    from libgeodesk_spark.operators.topology import nodes_of
    pts = _points(spark, sf_dir)
    fn = pts.filter(F.col("pid") % 3 == 0) \
        .select(F.col("pid").alias("node_id"), "x", "y")
    return nodes_of(_ways(spark, sf_dir), fn) \
        .select("way_id", "seq", "x", "y", "node_id")


def _q_way_length(spark, sf_dir):
    """G1 over the stored ways table: Σ per-segment cm (order-independent
    integer total, same rounding contract as zone_length)."""
    from libgeodesk_spark.functions.geometry import way_length_cm
    return (_ways(spark, sf_dir)
            .select("way_id", way_length_cm(F.col("ring")).alias("length_cm")))


def _q_stream_dedup(spark, sf_dir):
    """Structured Streaming STATEFUL dedup (applyInPandasWithState) driven
    as two availableNow epochs through one checkpoint: even-pid rows land
    in epoch 1, odd-pid rows in epoch 2; each phash%256 key emits exactly
    once — the first epoch that saw it — with its in-epoch duplicate
    count. Deterministic, so it has an exact SQL oracle."""
    import tempfile

    from libgeodesk_spark.streaming.ingest import stream_first_seen
    base = tempfile.mkdtemp(prefix="spark_graft_stream_")
    src, out, ck = f"{base}/src", f"{base}/out", f"{base}/ck"
    pts = _points(spark, sf_dir).select(
        (F.col("phash") % 256).alias("key"), "image_id", "pid")

    def epoch(batch_df, sub):
        batch_df.drop("pid").write.parquet(f"{src}/{sub}")
        stream = spark.readStream.schema("key long, image_id string") \
            .parquet(src + "/*")
        q = (stream_first_seen(stream, key_col="key")
             .writeStream.format("parquet")
             .option("path", out).option("checkpointLocation", ck)
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination(300)

    epoch(pts.filter(F.col("pid") % 2 == 0), "b1")
    epoch(pts.filter(F.col("pid") % 2 != 0), "b2")
    return spark.read.parquet(out).select("key", "image_id", "n_dups")


def _q_distance_to_zone(spark, sf_dir):
    from libgeodesk_spark.operators.distance import distance_to_zone
    return distance_to_zone(_points(spark, sf_dir), _zone("convex"))


def _q_phash_near_dups(spark, sf_dir):
    """Visual near-dup pairs by 64-bit perceptual hash (input_hint column
    ``phash``): plant a deterministic twin (one flipped bit) for every
    50th image, then find all pairs within hamming<=3 via the 4x16-bit
    banded self-join — the image-payload dedup primitive. Base phashes
    are LCG-random, so the exact pair set is the planted twins (both
    engines compute it identically)."""
    from libgeodesk_spark.operators.dedup import phash_near_dups
    pts = _points(spark, sf_dir).select("image_id", "pid", "phash")
    twins = pts.filter(F.col("pid") % 50 == 0).select(
        F.concat(F.col("image_id"), F.lit("_t")).alias("image_id"),
        F.expr("phash ^ shiftleft(CAST(1 AS BIGINT), "
               "CAST(pid % 8 AS INT))").alias("phash"))
    imgs = pts.select("image_id", "phash").unionByName(twins)
    return phash_near_dups(imgs)


def _q_knn_join(spark, sf_dir):
    """Exact kNN JOIN (operators/knn.knn_join — multi-resolution grid
    doubling, every query point gets its k nearest): gated on a 1/97
    query sample so the windowed-cross-join oracle stays tractable; the
    operator runs the same distributed rounds regardless, and the FULL
    join is brute-verified in pytest at sf0.001."""
    from libgeodesk_spark.operators.knn import knn_join
    pts = _points(spark, sf_dir).select("pid", "x", "y")
    return knn_join(pts, 3, queries=pts.filter(F.col("pid") % 97 == 0))


def _q_stream_join(spark, sf_dir):
    """STREAM-STREAM inner join (purchases x views within 1 hour, same
    user), driven as two availableNow epochs (split by event_id parity,
    so cross-epoch pairs must match through checkpointed state) through
    one checkpoint in append mode. The watermark exceeds the data span,
    so no state evicts before its partner arrives and the oracle is the
    plain SQL range join (streaming/ingest.stream_range_join documents
    the production eviction contract)."""
    import tempfile

    from libgeodesk_spark.streaming.ingest import stream_range_join
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    base = tempfile.mkdtemp(prefix="spark_graft_ssj_")
    lsrc, rsrc, out, ck = (f"{base}/l", f"{base}/r",
                           f"{base}/out", f"{base}/ck")

    def epoch(pred, sub):
        ev.filter(f"event_type = 'purchase' AND ({pred})") \
          .select("event_id", "user_id", "ts").write.parquet(f"{lsrc}/{sub}")
        ev.filter(f"event_type = 'view' AND ({pred})") \
          .select("event_id", "user_id", "ts").write.parquet(f"{rsrc}/{sub}")
        sch = "event_id long, user_id long, ts timestamp"
        l = spark.readStream.schema(sch).parquet(lsrc + "/*")
        r = spark.readStream.schema(sch).parquet(rsrc + "/*")
        j = stream_range_join(l, r, "user_id").select(
            F.col("l.event_id").alias("p_id"),
            F.col("l.user_id").alias("user_id"),
            F.col("r.event_id").alias("v_id"))
        q = (j.writeStream.format("parquet").option("path", out)
             .option("checkpointLocation", ck)
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination(300)

    epoch("event_id % 2 = 0", "b1")
    epoch("event_id % 2 = 1", "b2")
    return spark.read.parquet(out).select("p_id", "user_id", "v_id")


def _q_asof_views(spark, sf_dir):
    """As-of join (operators/asof.py): each purchase event matched to
    its user's latest at-or-before view — one windowed union pass, no
    range join. Oracle: DuckDB's NATIVE ASOF LEFT JOIN."""
    from libgeodesk_spark.operators.asof import asof_join
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    left = ev.filter("event_type = 'purchase'") \
        .select("event_id", "user_id", "ts")
    right = ev.filter("event_type = 'view'") \
        .select("user_id", "ts", "event_id")
    return asof_join(left, right, ["user_id"], "ts", ["event_id"]) \
        .select("event_id", "user_id", "r_event_id")


def _q_cell_hulls(spark, sf_dir):
    """Per-cell minimal convex hull stats (exact int kernel; GEOS-ops
    analog, operators/geomops.py). No SQL oracle — convex hull is not
    expressible in DuckDB SQL; kernel is brute-verified in pytest.

    Self-asserting invariants (so the rows-only gate can still FAIL):
    point conservation (Σ n_points == input rows), n_hull <= n_points,
    and 2·area within the cell's exact bbox bound (area2 <= 2·w·h)."""
    from libgeodesk_spark.operators.geomops import cell_hulls
    pts = _points(spark, sf_dir)
    out = cell_hulls(pts).persist()
    bbox = pts.groupBy("cell_id").agg(
        ((F.max("x") - F.min("x")) * (F.max("y") - F.min("y")))
        .alias("_bbox_area"))
    bad = (out.join(bbox, "cell_id", "left")
           .filter((F.col("n_hull") > F.col("n_points"))
                   | (F.col("n_hull") < 1) | (F.col("area2") < 0)
                   | F.col("_bbox_area").isNull()
                   | (F.col("area2") > 2 * F.col("_bbox_area"))).count())
    placed = out.agg(F.sum("n_points")).first()[0]
    n_in = pts.count()
    if bad or placed != n_in:
        raise AssertionError(
            f"cell_hulls gate: {bad} invariant-violating cells, "
            f"{placed}/{n_in} points covered — hull kernel regressed")
    return out


def _q_near_pairs(spark, sf_dir):
    """All point pairs within 32 units (grid band join — the all-pairs
    maxMetersFrom; operators/distance.within_distance_pairs)."""
    from libgeodesk_spark.operators.distance import within_distance_pairs
    return within_distance_pairs(_points(spark, sf_dir), NEAR_PAIRS_R,
                                 id_col="pid")


def _q_clean_corpus(spark, sf_dir):
    """The composed training-data pipeline (operators/pipeline.py):
    quality gate -> exact dedup keep-first -> embedding attach, one
    Catalyst plan, oracle-mirrored end to end."""
    from libgeodesk_spark.operators.pipeline import clean_corpus
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return clean_corpus(docs, emb)


def _q_stream_window_counts(spark, sf_dir):
    """Event-time windowed counts with WATERMARK late-data drop, driven as
    two availableNow epochs through one checkpoint (append mode — only
    closed windows emit, exactly once).

    Deterministic timeline (seconds after a fixed base): epoch 1 = even
    pids at s = pid%120 (windows w0 [0,60) and w1 [60,120)); its max
    event s=118 advances the checkpointed watermark to 88, closing and
    EMITTING w0. Spark's aggregation lateness is WINDOW-granular (a row
    is dropped iff its window can no longer accept data: window.end <=
    watermark — verified against StreamingQueryProgress
    numRowsDroppedByWatermark), so epoch 2 = odd pids at s = pid%180
    splits three ways: s<60 targets the closed w0 and is DROPPED
    (observable: w0 never re-emits, no odd-cell w0 rows exist), s in
    [60,120) joins the still-open w1 (behind the watermark but the
    window isn't closed — accepted), s>=120 stays in the never-emitted
    w2. Epoch 2's max s=179 moves the watermark to 149, closing w1.
    No boundary ties: window ends are 60/120/180 vs watermarks 88/149.
    Oracle = the same arithmetic as one SQL aggregate."""
    import tempfile

    from libgeodesk_spark.streaming.ingest import stream_cell_counts
    base = tempfile.mkdtemp(prefix="spark_graft_wm_")
    src, out, ck = f"{base}/src", f"{base}/out", f"{base}/ck"
    pts = _points(spark, sf_dir).select("pid")
    s = F.when(F.col("pid") % 2 == 0, F.col("pid") % 120) \
         .otherwise(F.col("pid") % 180)
    ev = pts.select(
        "pid",
        F.timestamp_seconds(F.lit(WM_BASE_EPOCH) + s).alias("ts"),
        ((F.col("pid") % 4) * F.lit(1 << 20) + F.lit(10)).alias("x"),
        F.lit(10).alias("y"))

    def epoch(df, sub):
        df.write.parquet(f"{src}/{sub}")
        counts = stream_cell_counts(spark, src + "/*",
                                    "pid long, ts timestamp, x long, y long",
                                    watermark="30 seconds")
        q = (counts.writeStream.format("parquet")
             .option("path", out).option("checkpointLocation", ck)
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination(300)

    epoch(ev.filter(F.col("pid") % 2 == 0), "b1")
    epoch(ev.filter(F.col("pid") % 2 != 0), "b2")
    return spark.read.parquet(out).select(
        (F.col("window.start").cast("long") - WM_BASE_EPOCH).alias("start_s"),
        "cell_id", F.col("n").cast("long").alias("n"))


def _q_stream_sessions(spark, sf_dir):
    """Event-time SESSION windows (streaming sessionization) as two
    availableNow epochs through one checkpoint: epoch 1 (even pids at
    s = pid%120, user = (pid>>1)%2) builds one open session per user
    (every gap < 30s); nothing emits — session ends (last_ts + 30s)
    are beyond the watermark. Epoch 2 adds two far-future rows whose
    watermark closes the epoch-1 sessions, emitting each EXACTLY once
    with its full count; epoch 2's own sessions stay open and never
    emit. Oracle: per-user min/max/count over the epoch-1 rows."""
    import tempfile

    from libgeodesk_spark.streaming.ingest import stream_session_counts
    base = tempfile.mkdtemp(prefix="spark_graft_sess_")
    src, out, ck = f"{base}/src", f"{base}/out", f"{base}/ck"
    pts = _points(spark, sf_dir).select("pid")

    def ev(df, s_col):
        return df.select(
            F.shiftright(F.col("pid"), 1).bitwiseAND(F.lit(1))
             .alias("user_id"),
            F.timestamp_seconds(F.lit(WM_BASE_EPOCH) + s_col).alias("ts"))

    def epoch(df, sub):
        df.write.parquet(f"{src}/{sub}")
        s = spark.readStream.schema("user_id long, ts timestamp")             .parquet(src + "/*")
        q = (stream_session_counts(s).writeStream.format("parquet")
             .option("path", out).option("checkpointLocation", ck)
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination(300)

    epoch(ev(pts.filter(F.col("pid") % 2 == 0), F.col("pid") % 120), "b1")
    epoch(ev(pts.filter(F.col("pid") % 2 != 0).limit(0), F.lit(0))
          .unionByName(spark.createDataFrame(
              [(0, 1000), (1, 1010)], "user_id long, s long")
              .select("user_id", F.timestamp_seconds(
                  F.lit(WM_BASE_EPOCH) + F.col("s")).alias("ts"))), "b2")
    return spark.read.parquet(out).select(
        "user_id",
        (F.col("session_window.start").cast("long") - WM_BASE_EPOCH)
        .alias("start_s"),
        (F.col("session_window.end").cast("long") - WM_BASE_EPOCH)
        .alias("end_s"),
        F.col("n").cast("long").alias("n"))


def _q_snapshot_scan(spark, sf_dir):
    """Snapshot-table semantics end-to-end (the Iceberg-analog,
    sources/catalog.py): commit even-pid points as snapshot 1, append
    odd-pid points as snapshot 2, then MANIFEST-PRUNED time-travel scan
    of snapshot 1 over a cell_id range. Correct iff (a) snapshot 1 never
    sees the second commit, (b) file pruning loses no rows, (c) the
    residual filter is exact — the oracle is a plain WHERE over pts."""
    import tempfile

    from libgeodesk_spark.sources.catalog import SnapshotTable
    pts = _points(spark, sf_dir).select("image_id", "pid", "cell_id")
    tbl = SnapshotTable(tempfile.mkdtemp(prefix="spark_graft_snap_") + "/t",
                        stat_cols=("cell_id",))
    tbl.commit(pts.filter(F.col("pid") % 2 == 0)
               .repartitionByRange(8, "cell_id"))
    tbl.commit(pts.filter(F.col("pid") % 2 != 0))
    lo, hi = SNAP_CELL_RANGE
    df, _plan = tbl.planned_scan(spark, {"cell_id": (lo, hi)}, snapshot_id=1)
    return df.select("image_id", "pid", "cell_id")


def _q_snapshot_within(spark, sf_dir):
    """INTEGRATION row — store → index walk → spatial join composed:
    commit the Z-ordered point table into a SnapshotTable (S9), scan it
    through manifest bbox pruning on the zone's window (S3's two-level
    accept: file stats prune, residual filter re-checks), then the
    within join (J2) on the pruned scan. Correct iff the composition
    loses/duplicates nothing — the oracle is the plain within_sql over
    ALL points, identical to within_comb's."""
    import tempfile

    from libgeodesk_spark.operators.spatial_join import join_zones
    from libgeodesk_spark.sources.catalog import SnapshotTable
    pts = _points(spark, sf_dir).select("image_id", "x", "y", "cell_id")
    tbl = SnapshotTable(tempfile.mkdtemp(prefix="spark_graft_snapw_") + "/t",
                        stat_cols=("x", "y"))
    tbl.commit(pts, zorder_by=("x", "y"))
    z = _zone("comb")
    mnx, mny, mxx, mxy = z.bbox
    df, _plan = tbl.planned_scan(spark, {"x": (mnx, mxx), "y": (mny, mxy)})
    return join_zones(df, [z], predicate="within",
                      columns=["image_id", "cell_id"],
                      single_pass=True).select("image_id", "cell_id")


def _q_user_sessions(spark, sf_dir):
    """Window-function coverage: per-user session counts with a 30-minute
    gap rule over the events stream table (lag + conditional cumsum)."""
    from pyspark.sql import Window
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = Window.partitionBy("user_id").orderBy("ts")
    ep = F.unix_timestamp(F.col("ts").cast("timestamp"))
    gap = ep - F.lag(ep).over(w)
    marked = ev.withColumn("new_sess",
                           F.when(gap.isNull() | (gap > 1800), 1).otherwise(0))
    return (marked.groupBy("user_id")
            .agg(F.sum("new_sess").alias("n_sessions"),
                 F.count("*").alias("n_events")))


def _memb_nested(spark, sf_dir):
    """Nested gate membership: way members from lineitem rows plus
    RELATION-typed members chaining rank-adjacent orderkeys (chains of 8,
    broken at rank%8==7) and a BACK edge at each chain start (rank%8==0)
    — every walk from a chain head hits a genuine 2-cycle, exercising the
    RecursionGuard for real. Rank = dense row_number over distinct
    orderkeys, identical in Spark and DuckDB."""
    from pyspark.sql import Window
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    r = (li.select(F.col("l_orderkey").alias("k")).distinct()
         .select("k", (F.row_number().over(Window.orderBy("k")) - 1)
                 .alias("i")))
    base = li.select(
        F.col("l_orderkey").alias("rel_id"),
        (F.col("l_orderkey") * 8 + F.col("l_linenumber")).alias("member_id"),
        F.lit("way").alias("mtype")).distinct()
    a, b = r.alias("a"), r.alias("b")
    adj = a.join(b, F.col("b.i") == F.col("a.i") + 1)
    nest = adj.filter(F.col("a.i") % 8 != 7).select(
        F.col("a.k").alias("rel_id"), F.col("b.k").alias("member_id"),
        F.lit("relation").alias("mtype"))
    back = adj.filter(F.col("a.i") % 8 == 0).select(
        F.col("b.k").alias("rel_id"), F.col("a.k").alias("member_id"),
        F.lit("relation").alias("mtype"))
    return base.unionByName(nest).unionByName(back)


def _q_rel_members_recursive(spark, sf_dir):
    """Recursive relation traversal (RelatedIterator + RecursionGuard,
    include/geodesk/feature/RelatedIterator.h:20-80): cycle-guarded BFS
    closure, each transitive member at its minimum depth. Oracle:
    DuckDB WITH RECURSIVE over the same membership."""
    from libgeodesk_spark.operators.topology import members_recursive
    return members_recursive(_memb_nested(spark, sf_dir), REL_IDS) \
        .select("root_id", "member_id", "mtype",
                F.col("depth").cast("long").alias("depth"))


def _q_way_crossing(spark, sf_dir):
    """Whole-way crossing (CrossesFilter.cpp:10-41 accepts any feature):
    JVM segment explode -> cover-pruned crossing kernel -> distinct ways."""
    from libgeodesk_spark.operators.way_join import way_crossing
    return way_crossing(_ways(spark, sf_dir), _zone("comb")) \
        .select("way_id")


def _q_stream_snapshot(spark, sf_dir):
    """Streaming -> SnapshotTable exactly-once: two availableNow epochs
    land as atomic snapshot commits through one checkpoint, then the
    LAST epoch is REPLAYED (the foreachBatch at-least-once window — sink
    committed, checkpoint didn't record) and must be a no-op via the
    (query, epoch) manifest tag. Correct iff the final snapshot holds
    every point exactly once — the oracle is a plain SELECT."""
    import tempfile

    from libgeodesk_spark.sources.catalog import SnapshotTable
    from libgeodesk_spark.streaming.ingest import (
        snapshot_batch_committer,
        stream_to_snapshot,
    )
    base = tempfile.mkdtemp(prefix="spark_graft_ssnap_")
    src, ck = f"{base}/src", f"{base}/ck"
    tbl = SnapshotTable(f"{base}/t", stat_cols=("cell_id",))
    pts = _points(spark, sf_dir).select("image_id", "pid", "cell_id")

    def epoch(df, sub):
        df.write.parquet(f"{src}/{sub}")
        stream = spark.readStream.schema(
            "image_id string, pid long, cell_id long").parquet(src + "/*")
        q = stream_to_snapshot(stream, tbl, ck, query_name="gate")
        q.awaitTermination(300)

    epoch(pts.filter(F.col("pid") % 2 == 0), "b1")
    epoch(pts.filter(F.col("pid") % 2 != 0), "b2")
    replay = max(int(t.split(":")[1]) for t in tbl.commit_tags())
    snapshot_batch_committer(tbl, "gate")(
        pts.filter(F.col("pid") % 2 != 0), replay)
    return tbl.read(spark).select("image_id", "pid", "cell_id")


def _q_ann_recall_d256(spark, sf_dir):
    """ANN recall at PRODUCTION dimension (256-d): the LSH signature
    dispatches to the Arrow numpy-matmul path (planes x dim >
    LSH_JVM_MAX_TERMS), IVF re-trains at the same dim — evidence the
    approximate paths hold beyond the 64-d gate corpus. Rows-only
    metric row (approx-path quality, like ann_recall)."""
    from libgeodesk_spark.operators.ann import ann_recall, synth_embeddings
    emb = synth_embeddings(spark, 2000, 256)
    return _assert_recall_floor(ann_recall(emb, ANN_QIDS, 10, dim=256),
                                RECALL_FLOORS_D256)


def _q_stream_within(spark, sf_dir):
    """STREAMING point-in-polygon (streaming/ingest.stream_within):
    points arrive as two availableNow epochs; each micro-batch flows
    through the SAME broadcast interval join + Arrow kernel as the
    batch path and appends memberships to a parquet sink. Stateless —
    exact, so the oracle is the batch within SQL."""
    import tempfile

    import numpy as np

    from libgeodesk_spark.geom.zones import prepare_zone
    from libgeodesk_spark.sources.points import GATE_ZONES
    from libgeodesk_spark.streaming.ingest import stream_within
    zone = prepare_zone("comb", [np.array(r) for r in GATE_ZONES["comb"]])
    base = tempfile.mkdtemp(prefix="spark_graft_swithin_")
    src, out, ck = f"{base}/src", f"{base}/out", f"{base}/ck"
    pts = _points(spark, sf_dir).select("image_id", "pid", "x", "y",
                                        "cell_id")

    def epoch(batch_df, sub):
        batch_df.write.parquet(f"{src}/{sub}")
        stream = spark.readStream.schema(
            "image_id string, pid long, x long, y long, cell_id long") \
            .parquet(src + "/*")
        q = (stream_within(stream, [zone],
                           columns=["image_id", "cell_id"])
             .writeStream.format("parquet")
             .option("path", out).option("checkpointLocation", ck)
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination(300)

    epoch(pts.filter(F.col("pid") % 2 == 0), "b1")
    epoch(pts.filter(F.col("pid") % 2 != 0), "b2")
    return spark.read.parquet(out).select("image_id", "cell_id")


def _q_zoneprep_within(spark, sf_dir):
    """INTEGRATION row for the DISTRIBUTED zone-prep path (operators/
    zoneprep.py): gate zones serialized to WKB → executor-side
    mapInPandas prep (edges + exact cover) → join_zones_catalog — the
    Spark-END-TO-END join (r5): the interval build side broadcasts as a
    DataFrame and the boundary band cogroups with executor-held edge
    blobs, so NO per-zone object (cover dict, edge array, interval row)
    ever transits the driver. Correct iff the distributed prep is
    bit-identical to the driver prep AND the multi-zone join is exact —
    the oracle is the per-zone PIP SQL union."""
    import numpy as np

    from libgeodesk_spark.geom.wkb import rings_to_wkb
    from libgeodesk_spark.operators.spatial_join import join_zones_catalog
    from libgeodesk_spark.operators.zoneprep import prepared_zones_df
    from libgeodesk_spark.sources.points import GATE_ZONES
    wkb = spark.createDataFrame(
        [(n, bytearray(rings_to_wkb([np.array(r) for r in rings],
                                    merc=True)))
         for n, rings in GATE_ZONES.items()],
        "zone_id string, wkb binary")
    prepped = prepared_zones_df(wkb, n_slices=4)
    pts = _points(spark, sf_dir)
    return join_zones_catalog(pts, prepped, predicate="within",
                              columns=["image_id"]) \
        .select("image_id", "zone_id")


def _q_snapshot_evolved(spark, sf_dir):
    """Schema evolution end-to-end (field-id mapping, catalog.py):
    commit even-pid points with a salt column, RENAME cell_id→tile_id
    (metadata-only), DROP salt (metadata-only), append odd-pid points
    under the new schema, then scan. Correct iff renamed columns serve
    old files' bytes, dropped columns vanish, and no row is lost — the
    oracle is a plain projection with the rename applied."""
    import tempfile

    from libgeodesk_spark.sources.catalog import SnapshotTable
    pts = _points(spark, sf_dir).select("image_id", "pid", "cell_id", "salt")
    tbl = SnapshotTable(tempfile.mkdtemp(prefix="spark_graft_evo_") + "/t",
                        stat_cols=("cell_id",))
    tbl.commit(pts.filter(F.col("pid") % 2 == 0))
    tbl.rename_column(spark, "cell_id", "tile_id")
    tbl.drop_column(spark, "salt")
    tbl.commit(pts.filter(F.col("pid") % 2 != 0)
               .select("image_id", "pid",
                       F.col("cell_id").alias("tile_id")))
    return tbl.read(spark).select("image_id", "pid", "tile_id")


KNN_BATCH_QUERIES = [
    ("qa", 90_500_000, 642_500_000),
    ("qb", 93_000_000, 644_000_000),
    ("qc", 94_001_000, 643_001_000),   # inside the hot cell
    ("qd", 89_100_000, 647_900_000),   # window corner
    ("qe", 96_000_000, 641_000_000),
]


def _q_knn_batch(spark, sf_dir):
    from libgeodesk_spark.operators.knn import knn_batch
    return knn_batch(_points(spark, sf_dir), KNN_BATCH_QUERIES, 10)         .select("qid", "image_id", "sq_dist", "rank")


RING_R = 3


def _q_cell_ring(spark, sf_dir):
    """Point counts over the Chebyshev ring-<=3 cells around the kNN query
    cell (the kNN candidate pre-window, PointDistanceFilter.cpp:16-22)."""
    from libgeodesk_spark import mercator
    from libgeodesk_spark.operators.knn import _ring_cells
    qcol = int(mercator.col_from_x(KNN_Q[0], 12))
    qrow = int(mercator.row_from_y(KNN_Q[1], 12))
    cells = [c for r in range(RING_R + 1) for c in _ring_cells(qcol, qrow, r, 12)]
    return (_points(spark, sf_dir).filter(F.col("cell_id").isin(cells))
            .groupBy("cell_id").agg(F.count("*").alias("n")))


EMB_NEAR_THRESH = None  # set below via module constant


def _q_emb_near_dup(spark, sf_dir):
    """Embedding near-duplicate pairs: exact quantized-L2 self-join below a
    threshold (the embedding-cosine near-dup analog, exact for the gate).

    r6 shape: pre-quantize once per ROW (not per pair) and prune pairs
    with an exact first-dimension band — d2 <= D2 implies
    |q0_a - q0_b| <= isqrt(D2), so bucketing q0 by isqrt(D2)-wide bins
    and equi-joining on adjacent bins keeps every qualifying pair while
    replacing the all-pairs BroadcastNestedLoopJoin with a
    BroadcastHashJoin. Same rows, same d2 values (oracle-checked)."""
    import math

    from libgeodesk_spark.operators.ann import _quantized, quantized_sq_l2_pre
    r = int(math.isqrt(EMB_NEAR_D2))
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    base = emb.select(F.col("vec_id"),
                      _quantized(F.col("embedding")).alias("q")) \
        .select("vec_id", "q",
                F.floor(F.element_at(F.col("q"), 1)
                        / F.lit(r)).cast("long").alias("bk"))
    a = base.select(F.col("vec_id").alias("id_a"), F.col("q").alias("qa"),
                    F.col("bk"))
    b = base.select(
        F.col("vec_id").alias("id_b"), F.col("q").alias("qb"),
        F.explode(F.array(F.col("bk") - 1, F.col("bk"),
                          F.col("bk") + 1)).alias("bk"))
    pairs = a.join(F.broadcast(b), ["bk"]).filter(F.col("id_a") < F.col("id_b"))
    d2 = quantized_sq_l2_pre(F.col("qa"), F.col("qb")).alias("d2")
    return pairs.select("id_a", "id_b", d2).filter(F.col("d2") <= EMB_NEAR_D2)


# --- text / dedup / ANN / GOQL / tile-agg ----------------------------------

ANN_QIDS = [0, 1, 2, 3, 4]
GOQL_QUERY = "*[lang=en,fr][n_chars>300]"
# goql_tags: same selector language over a DYNAMIC map<string,string> tag
# column (the OSM-faithful TagTable model) incl. a wildcard + absent-key
GOQL_TAGS_QUERY = "*[lang=en,fr][n_chars>300][source=src1*][!missing]"
EMB_NEAR_D2 = 1_300_000   # quantized units² — ~0.5% of pairs at sf0.01


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _q_text_features(spark, sf_dir):
    from libgeodesk_spark.operators.textops import text_features
    return text_features(_docs(spark, sf_dir))


def _q_exact_dedup(spark, sf_dir):
    from libgeodesk_spark.operators.dedup import exact_dedup
    return exact_dedup(_docs(spark, sf_dir))


def _q_simhash(spark, sf_dir):
    from libgeodesk_spark.operators.dedup import simhash
    return simhash(_docs(spark, sf_dir))


def _q_simhash_near_dups(spark, sf_dir):
    from libgeodesk_spark.operators.dedup import simhash_near_dups
    return simhash_near_dups(_docs(spark, sf_dir))


def _q_minhash_lsh(spark, sf_dir):
    from libgeodesk_spark.operators.dedup import minhash_lsh_pairs
    return minhash_lsh_pairs(_docs(spark, sf_dir), 50)


def _q_ngram_jaccard(spark, sf_dir):
    from libgeodesk_spark.operators.dedup import ngram_jaccard_pairs
    return ngram_jaccard_pairs(_docs(spark, sf_dir), 50)


def _q_ann_topk(spark, sf_dir):
    from libgeodesk_spark.operators.ann import brute_topk
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return brute_topk(emb, ANN_QIDS, 10)


def _assert_topk_rows(df: DataFrame, k: int) -> DataFrame:
    """Every gate query must surface a full top-k list (corpus >> k and
    the candidate generators are tuned to never starve) — a silent
    candidate-starvation regression (empty buckets, dead probes) fails
    here instead of shrinking an uncheckable rows-only count."""
    n = df.count()
    want = len(ANN_QIDS) * k
    if n != want:
        raise AssertionError(
            f"ann top-k gate: {n} rows != {want} expected "
            f"({len(ANN_QIDS)} queries x k={k}) — candidate generation "
            f"starved")
    return df


def _q_ann_ivf(spark, sf_dir):
    from libgeodesk_spark.operators.ann import ivf_topk
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return _assert_topk_rows(ivf_topk(emb, ANN_QIDS, 10), 10)


def _q_ann_lsh(spark, sf_dir):
    from libgeodesk_spark.operators.ann import lsh_bucket_topk
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return _assert_topk_rows(lsh_bucket_topk(emb, ANN_QIDS, 10), 10)


PQ_RECALL_FLOOR = 90   # measured 100 at the sf0.01 gate shape; margin for
                       # float-reduction order in the distributed trainer
IVFPQ_RECALL_FLOOR = 85   # measured 94 (bounded by IVF probe recall)


def _q_ann_ivfpq(spark, sf_dir):
    """IVF+PQ composed (the FAISS IVFPQ / trillion-vector architecture:
    probe-pruned ADC scan over 8-byte codes, exact re-rank). Rows-only
    + self-asserting recall floor, like the other approximate paths."""
    from libgeodesk_spark.operators.ann import brute_topk, ivfpq_topk
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = ivfpq_topk(emb, ANN_QIDS, 10, nprobe=8, shortlist=64).persist()
    exact = {(r["qid"], r["vec_id"])
             for r in brute_topk(emb, ANN_QIDS, 10).collect()}
    got = {(r["qid"], r["vec_id"]) for r in out.collect()}
    recall = 100.0 * len(got & exact) / max(len(exact), 1)
    if recall < IVFPQ_RECALL_FLOOR:
        raise AssertionError(
            f"ann_ivfpq gate: recall@10 = {recall:.0f} < floor "
            f"{IVFPQ_RECALL_FLOOR} — probe routing or ADC regressed")
    return _assert_topk_rows(out, 10)


def _q_ann_ivfpq_persisted(spark, sf_dir):
    """The 'train once, STORE, load' contract exercised end-to-end
    (VERDICT r4 #3): IVF centroids + PQ codebooks train, round-trip
    through a parquet quantizer artifact (ann.save_quantizer /
    load_quantizer), and the IVF+PQ answer is built from the RELOADED
    arrays. Self-asserting twice: the reload must be bit-exact (else
    every stored list/code would be misrouted at scale) AND recall@10
    must clear the same floor as the in-line-trained row."""
    import shutil
    import tempfile

    import numpy as np

    from libgeodesk_spark.operators.ann import (
        brute_topk, ivf_centroids, ivfpq_topk, load_quantizer, pq_train,
        save_quantizer)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    from libgeodesk_spark.operators.ann import IVF_LISTS
    cents = ivf_centroids(emb, IVF_LISTS)
    books = pq_train(emb, iters=3)
    qdir = tempfile.mkdtemp(prefix="spark_graft_quant_")
    try:
        save_quantizer(spark, qdir + "/q", centroids=cents,
                       codebooks=books,
                       meta={"n_lists": IVF_LISTS, "pq": "8x8"})
        q = load_quantizer(spark, qdir + "/q")
        if not (np.array_equal(q["centroids"], cents)
                and np.array_equal(q["codebooks"], books)
                and q["meta"]["n_lists"] == IVF_LISTS):
            raise AssertionError(
                "ann_ivfpq_persisted gate: reloaded quantizer is not "
                "bit-identical to the trained one")
        out = ivfpq_topk(emb, ANN_QIDS, 10, n_lists=IVF_LISTS, nprobe=8,
                         shortlist=64, centroids=q["centroids"],
                         codebooks=q["codebooks"]).persist()
        exact = {(r["qid"], r["vec_id"])
                 for r in brute_topk(emb, ANN_QIDS, 10).collect()}
        got = {(r["qid"], r["vec_id"]) for r in out.collect()}
        recall = 100.0 * len(got & exact) / max(len(exact), 1)
        if recall < IVFPQ_RECALL_FLOOR:
            raise AssertionError(
                f"ann_ivfpq_persisted gate: recall@10 = {recall:.0f} < "
                f"floor {IVFPQ_RECALL_FLOOR} — reloaded quantizer "
                f"misroutes")
        return _assert_topk_rows(out, 10)
    finally:
        shutil.rmtree(qdir, ignore_errors=True)


def _q_ann_pq(spark, sf_dir):
    """PQ pipeline end-to-end (rows-only: ADC is float-ranked): train
    PQ8x8 codebooks distributed, encode, ADC shortlist, exact re-rank
    (ann.pq_topk_rerank). Self-asserting: recall@10 vs the exact brute
    baseline must stay over PQ_RECALL_FLOOR."""
    from libgeodesk_spark.operators.ann import (
        brute_topk, pq_encode, pq_topk_rerank, pq_train)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    books = pq_train(emb, iters=3)
    codes = pq_encode(emb, books)
    out = pq_topk_rerank(emb, codes, books, ANN_QIDS, 10, shortlist=64) \
        .persist()
    exact = {(r["qid"], r["vec_id"])
             for r in brute_topk(emb, ANN_QIDS, 10).collect()}
    got = {(r["qid"], r["vec_id"]) for r in out.collect()}
    recall = 100.0 * len(got & exact) / max(len(exact), 1)
    if recall < PQ_RECALL_FLOOR:
        raise AssertionError(
            f"ann_pq gate: recall@10 = {recall:.0f} < floor "
            f"{PQ_RECALL_FLOOR} — PQ shortlist/re-rank regressed")
    return out


def _q_ann_recall(spark, sf_dir):
    from libgeodesk_spark.operators.ann import ann_recall
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return _assert_recall_floor(ann_recall(emb, ANN_QIDS, 10),
                                RECALL_FLOORS_D64)


def _q_ann_cosine(spark, sf_dir):
    from libgeodesk_spark.operators.ann import cosine_topk
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return _assert_topk_rows(
        cosine_topk(emb, ANN_QIDS, 10).select("qid", "vec_id", "rank"), 10)


def _q_audio_codec_features(spark, sf_dir):
    """Self-asserting audio gate (rows-only): one deterministic clip set
    pushed through the Spark audio pipeline (mapInPandas over
    multimodal.audio_features) THREE times — as RIFF/WAVE PCM16 bytes,
    as real FLAC bytes (RFC 9639, media/flac.py), and as the FAUD fake
    container — must yield IDENTICAL integer features, and those must
    equal an independent numpy oracle computed straight from the
    synthesized samples (all three codecs quantize onto the same int16
    grid, so the containers are transparent). Any drift raises
    AssertionError -> the driver records err. No DuckDB oracle: SQL
    cannot decode audio containers."""
    import numpy as np
    from libgeodesk_spark.media import multimodal as mm
    from libgeodesk_spark.media.flac import encode_flac
    sr = 16000
    clips = [(i, mm.synth_audio(i, 1200 + 37 * i)) for i in range(48)]

    def df_for(enc, name):
        rows = [(f"clip{i:03d}", bytearray(enc(a, sr)), sr, len(a), 1, name)
                for i, a in clips]
        return spark.createDataFrame(rows, mm.AUDIO_SCHEMA)

    expected = []
    for i, a in clips:
        q = np.clip(np.rint(a * 32767), -32768, 32767) \
            .astype(np.int16).astype(np.float32) / 32767.0
        expected.append((f"clip{i:03d}",
                         int(round(float(np.sqrt(np.mean(q * q))) * 1e6)),
                         int(np.sum(np.abs(np.diff(np.signbit(q))))),
                         int(len(q) * 1000 / sr)))

    encoders = (("wav", mm.encode_wav), ("flac", encode_flac),
                ("faud", mm.encode_audio))
    for name, enc in encoders:
        got = [tuple(r) for r in
               mm.audio_features(df_for(enc, name)).orderBy("clip_id")
               .toPandas().itertuples(index=False)]
        if got != expected:
            bad = next((i for i, (g, e) in enumerate(zip(got, expected))
                        if g != e), min(len(got), len(expected)))
            detail = (f"{got[bad]} != {expected[bad]}"
                      if bad < min(len(got), len(expected))
                      else f"row count {len(got)} != {len(expected)}")
            raise AssertionError(
                f"audio gate: {name} features diverge from the numpy "
                f"oracle at clip {bad}: {detail}")
    return mm.audio_features(df_for(encoders[1][1], "flac"))


def _q_goql(spark, sf_dir):
    from libgeodesk_spark.functions.goql import goql_filter
    return goql_filter(_docs(spark, sf_dir), GOQL_QUERY).select("doc_id")


def _q_goql_tags(spark, sf_dir):
    """GOQL over a dynamic map<string,string> tag column built from the
    document columns — the reference's sparse-tag model (TagTable), with
    a wildcard value match and an absent-key clause. The oracle states
    the same predicate directly over the columns (the map is built from
    exactly those columns, so the truth tables are identical)."""
    from libgeodesk_spark.functions.goql import goql_filter
    docs = _docs(spark, sf_dir)
    tagged = docs.select(
        "doc_id",
        F.create_map(
            F.lit("lang"), F.col("lang"),
            F.lit("source"), F.col("source"),
            F.lit("n_chars"), F.col("n_chars").cast("string")).alias("tags"))
    return goql_filter(tagged, GOQL_TAGS_QUERY,
                       tags_col="tags").select("doc_id")


def _q_tile_captions(spark, sf_dir):
    """Per-(cell, fmt) caption digest — pure Column path (captions derived
    in JVM, digest = sha256 over image_id-sorted captions + NUL separators,
    mirroring operators/tileagg.py metrics)."""
    pts = _points(spark, sf_dir)
    cap = F.format_string('caption %d — café "№%d"',
                          F.col("pid"), F.col("pid") % 97)
    r = F.col("pid") % 10
    fmt = F.when(r < 4, "png").when(r < 8, "jpeg").otherwise("bmp")
    rows = pts.select("cell_id", fmt.alias("fmt"),
                      F.col("image_id"), cap.alias("caption"))
    agg = (rows.groupBy("cell_id", "fmt")
           .agg(F.count("*").alias("n_images"),
                F.sha2(F.concat_ws("", F.transform(
                    F.sort_array(F.collect_list(F.struct("image_id", "caption"))),
                    lambda s: F.concat(s["caption"], F.lit("\x00")))), 256)
                .alias("caption_sha")))
    return agg


def _q_tile_metrics(spark, sf_dir):
    """Self-asserting (VERDICT r3 #1): re-encode fidelity is enforced
    INSIDE the gate query — any tile whose min decoded-pixel PSNR falls
    under the 40 dB north-star, or whose re-encode-side caption digest
    differs from an INDEPENDENT pure-Column digest of the input
    captions (byte-for-byte preservation), raises → the driver records
    `err` instead of an unfalsifiable green."""
    from libgeodesk_spark.operators.tileagg import tile_reencode_metrics
    from libgeodesk_spark.sources.images import images_table
    img = images_table(spark, sf_dir)
    m = tile_reencode_metrics(img)
    # independent caption digest: same (image_id-sorted, NUL-separated)
    # contract as the Arrow-side metrics sha, but computed JVM-side from
    # the INPUT captions — a mismatch means a caption was lost/corrupted
    # crossing the re-encode stage
    expect = (img.groupBy("cell_id", "fmt")
              .agg(F.sha2(F.concat_ws("", F.transform(
                  F.sort_array(F.collect_list(
                      F.struct("image_id", "caption"))),
                  lambda s: F.concat(s["caption"], F.lit("\x00")))), 256)
                   .alias("_expect_sha")))
    checked = m.join(expect, ["cell_id", "fmt"], "left").persist()
    bad = checked.filter(
        (F.col("min_psnr") < F.lit(PSNR_FLOOR_DB))
        | F.col("_expect_sha").isNull()
        | (F.col("caption_sha") != F.col("_expect_sha"))).count()
    if bad:
        raise AssertionError(
            f"tile_metrics gate: {bad} (cell, fmt) groups under the "
            f"{PSNR_FLOOR_DB} dB PSNR floor or with caption digest "
            f"mismatch — re-encode fidelity regressed")
    return checked.select(
        "cell_id", "fmt", "n_images", "bytes_in", "bytes_out",
        (F.col("min_psnr") >= F.lit(PSNR_FLOOR_DB)).alias("psnr_ok"),
        "caption_sha")


def _q_tile_mosaic(spark, sf_dir):
    """Self-asserting: mosaic output must CONSERVE images — Σ n_images
    over mosaic tiles equals the input row count (every image placed in
    exactly one tile) and every tile carries a non-empty PNG."""
    from libgeodesk_spark.operators.tileagg import mosaic_tiles
    from libgeodesk_spark.sources.images import images_table
    img = images_table(spark, sf_dir)
    out = mosaic_tiles(img).select(
        "cell_id", "n_images", F.length("tile_png").alias("png_bytes")) \
        .persist()
    stats = out.agg(F.sum("n_images").alias("placed"),
                    F.min("png_bytes").alias("min_png")).first()
    n_in = img.count()
    if stats["placed"] != n_in or (stats["min_png"] or 0) <= 0:
        raise AssertionError(
            f"tile_mosaic gate: placed {stats['placed']} of {n_in} images "
            f"(min png bytes {stats['min_png']}) — mosaic dropped or "
            f"emitted empty tiles")
    return out


def _q_zorder(spark, sf_dir):
    from libgeodesk_spark.sources.writer import morton_key
    return _points(spark, sf_dir).select(
        "image_id", morton_key(F.col("x"), F.col("y")).alias("zkey"))


REL_IDS = list(range(100, 160))
MEMBER_PROBE_IDS = [k * 8 + ln for k in range(200, 280) for ln in (1, 2)]


def _membership(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return li.select(F.col("l_orderkey").alias("rel_id"),
                     (F.col("l_orderkey") * 8 + F.col("l_linenumber"))
                     .alias("member_id"),
                     F.col("l_linenumber").cast("string").alias("role")).distinct()


def _q_members_of(spark, sf_dir):
    from libgeodesk_spark.operators.topology import members_of
    return members_of(_membership(spark, sf_dir), REL_IDS, roles=["1", "2", "3"])


def _q_parents_of(spark, sf_dir):
    from libgeodesk_spark.operators.topology import parents_of
    return parents_of(_membership(spark, sf_dir), MEMBER_PROBE_IDS)


# --- geometry scalar functions over the zones rings table (G1-G5) ----------

def _q_zone_shoelace(spark, sf_dir):
    from libgeodesk_spark.functions.geometry import ring_shoelace2
    from libgeodesk_spark.sources.points import zones_df
    z = zones_df(spark)
    s2 = ring_shoelace2(F.col("ring")).alias("s2")
    per_ring = z.select("zone_id", "role", s2)
    net = F.sum(F.when(F.col("role") == "outer", F.abs(F.col("s2")))
                .otherwise(-F.abs(F.col("s2")))).alias("shoelace2_net")
    return per_ring.groupBy("zone_id").agg(net)


def _q_zone_centroid(spark, sf_dir):
    from libgeodesk_spark.functions.geometry import (
        areal_centroid_from_sums,
        ring_centroid_terms,
    )
    from libgeodesk_spark.sources.points import zones_df
    z = zones_df(spark)
    a, cx, cy = ring_centroid_terms(F.col("ring"), F.col("role") == "outer")
    per_ring = z.select("zone_id", a.alias("a"), cx.alias("cx"), cy.alias("cy"))
    sums = per_ring.groupBy("zone_id").agg(
        F.sum("a").alias("a"), F.sum("cx").alias("cx"), F.sum("cy").alias("cy"))
    ccx, ccy = areal_centroid_from_sums(F.col("a"), F.col("cx"), F.col("cy"))
    return sums.select("zone_id", ccx.alias("centroid_x"), ccy.alias("centroid_y"))


def _q_zone_length(spark, sf_dir):
    from libgeodesk_spark.functions.geometry import way_length_cm
    from libgeodesk_spark.sources.points import zones_df
    z = zones_df(spark)
    return (z.groupBy("zone_id")
            .agg(F.sum(way_length_cm(F.col("ring"))).alias("perimeter_cm")))


def _q_zone_lambert(spark, sf_dir):
    """Ellipsoid-alternative zone area: sinusoidal equal-area projection
    (LambertArea.h:44-85 — the reference's non-Mercator variant), net =
    Σ outer |ring| − inner |ring| per zone, rounded to integer m² (both
    engines compute ~1e10 m² with ~1e-5 m² float noise — rounding is
    deterministic)."""
    from libgeodesk_spark.functions.geometry import lambert_signed_area_m2
    from libgeodesk_spark.sources.points import zones_df
    z = zones_df(spark)
    s = lambert_signed_area_m2(F.col("ring")).alias("s")
    per = z.select("zone_id", "role", s)
    net = F.sum(F.when(F.col("role") == "outer", F.abs(F.col("s")))
                .otherwise(-F.abs(F.col("s"))))
    return per.groupBy("zone_id").agg(
        F.round(net).cast("long").alias("lambert_m2"))


def _q_zone_bbox(spark, sf_dir):
    from libgeodesk_spark.functions.geometry import ring_bbox
    from libgeodesk_spark.sources.points import zones_df
    z = zones_df(spark).select("zone_id", ring_bbox(F.col("ring")).alias("b"))
    return (z.groupBy("zone_id")
            .agg(F.min("b.min_x").alias("min_x"), F.min("b.min_y").alias("min_y"),
                 F.max("b.max_x").alias("max_x"), F.max("b.max_y").alias("max_y")))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """ORDER MATTERS: the driver's CORRECTNESS run records the FIRST 50
    entries only. Round-5 rotation (VERDICT r4 'Next round' #6): lead
    with (a) rows NEW or with a CHANGED implementation this round
    (quantizer persistence; zoneprep_within now Spark end-to-end; real
    PNG under the tile gates; structural dedup keys; catalog legacy
    reads), then (b) the 25 rows whose newest driver record is r3
    (spatial/zone/GOQL/topology/stream_dedup/text_features), then (c)
    refreshed r4 rows filling the window. The r4-recorded multi-green
    rows take the tail; pytest + check_oracle still cover them every
    round. After r5 every query's newest driver record is <= 1 round
    old. In-window boundary (position 50) = audio_codec_features; first
    out-of-window row = ann_cosine_topk (ADVICE r5: the registry count
    puts the boundary there, matching the inline comments)."""
    return {
        # --- (a) new or implementation-changed this round -------------
        "ann_ivfpq_persisted": _q_ann_ivfpq_persisted,  # rows-only+asserts
        "zoneprep_within": _q_zoneprep_within,       # now end-to-end Spark
        "tile_metrics": _q_tile_metrics,  # real PNG; rows-only + asserts
        "tile_mosaic": _q_tile_mosaic,    # real PNG; rows-only + asserts
        "simhash_near_dups": _q_simhash_near_dups,   # structural null key
        "minhash_lsh_pairs": _q_minhash_lsh,         # structural null key
        "ngram_jaccard_pairs": _q_ngram_jaccard,     # structural null key
        "snapshot_evolved": _q_snapshot_evolved,     # legacy-read fix path
        "snapshot_scan": _q_snapshot_scan,
        "snapshot_within": _q_snapshot_within,
        "stream_snapshot": _q_stream_snapshot,
        "knn_join": _q_knn_join,                     # megacity pre-top-k
        # --- (b) newest driver record r3: lead the refresh ------------
        "intersects_comb": _q_intersects("comb"),
        "contains_point": _q_contains_point,
        "knn_k5": _q_knn(5),
        "knn_k50": _q_knn(50),
        "radius_500k": _q_radius,
        "way_within": _q_way_within,
        "way_intersects": _q_way_intersects,
        "rel_within": _q_rel_within,
        "rel_intersects": _q_rel_intersects,
        "way_distance": _q_way_distance,
        "way_length": _q_way_length,
        "nodes_of": _q_nodes_of,
        "crossing_segments": _q_crosses,
        "members_of": _q_members_of,
        "parents_of": _q_parents_of,
        "goql_filter": _q_goql,
        "goql_tags": _q_goql_tags,
        "zone_shoelace": _q_zone_shoelace,
        "zone_centroid": _q_zone_centroid,
        "zone_length": _q_zone_length,
        "zone_bbox": _q_zone_bbox,
        "zone_lambert_area": _q_zone_lambert,
        "zorder_key": _q_zorder,
        "stream_dedup": _q_stream_dedup,
        "text_features": _q_text_features,
        # --- (c) r4-recorded rows refreshed inside the window ---------
        "stream_within": _q_stream_within,
        "ann_ivfpq_topk": _q_ann_ivfpq,   # rows-only + recall floor
        "ann_recall": _q_ann_recall,      # rows-only + RECALL FLOOR assert
        "ann_recall_d256": _q_ann_recall_d256,  # rows-only + recall floor
        "ann_pq_topk": _q_ann_pq,         # rows-only + PQ recall floor
        "ann_lsh_topk": _q_ann_lsh,       # rows-only + top-k row contract
        "ann_ivf_topk": _q_ann_ivf,       # rows-only + top-k row contract
        "tile_captions": _q_tile_captions,
        "tile_stats": _q_tile_stats,
        "exact_dedup": _q_exact_dedup,
        "simhash": _q_simhash,
        "ann_topk": _q_ann_topk,
        "audio_codec_features": _q_audio_codec_features,  # NEW r5:
        # rows-only + numpy-oracle assert over wav/flac/faud codecs
        # --- beyond the 50-row window: r4-recorded multi-green --------
        "ann_cosine_topk": _q_ann_cosine,    # rows-only (float ranking;
        # r4-recorded, rotated out for the r5 window)
        "clean_corpus": _q_clean_corpus,
        "phash_near_dups": _q_phash_near_dups,
        "stream_window_counts": _q_stream_window_counts,
        "stream_join": _q_stream_join,
        "stream_sessions": _q_stream_sessions,
        "cell_hulls": _q_cell_hulls,      # rows-only + invariant asserts
        "cell_ring": _q_cell_ring,
        "emb_near_dup": _q_emb_near_dup,
        "distance_to_zone": _q_distance_to_zone,
        "user_sessions": _q_user_sessions,
        "knn_batch": _q_knn_batch,
        "near_pairs": _q_near_pairs,
        "asof_views": _q_asof_views,
        "hot_cells": _q_hot_cells,
        "colocated_grid": _q_colocated,
        "tpch_q1": _q_tpch_q1,
        "events_by_type": _q_events_by_type,
        "orders_by_segment": _q_orders_by_segment,
        "rel_members_recursive": _q_rel_members_recursive,
        "way_crossing": _q_way_crossing,
        "cell_assign": _q_cell_assign,
        "cell_pyramid": _q_cell_pyramid,
        "bbox_window": _q_bbox,
        "within_convex": _q_within("convex"),
        "within_comb": _q_within("comb"),
        "within_holed": _q_within("holed"),
    }


# ---------------------------------------------------------------------------
# DuckDB oracle SQL
# ---------------------------------------------------------------------------

def oracle_sql() -> dict[str, str]:
    from libgeodesk_spark.sources.points import (
        GATE_ZONES,
        locate_sql,
        points_cte,
        within_sql,
    )

    pc = points_cte()

    # geometry scalar oracle (edges from the shared VALUES vertices)
    from libgeodesk_spark.mercator import EARTH_CIRCUMFERENCE, MAP_WIDTH
    from libgeodesk_spark.sources.points import zone_vertices_values_sql
    PI = 3.14159265358979323846
    edges_cte = f"""
    WITH v AS (SELECT * FROM {zone_vertices_values_sql()}),
    e AS (
      SELECT a.zone_id, a.ring_id, a.role,
             a.x AS x1, a.y AS y1, b.x AS x2, b.y AS y2
      FROM v a JOIN v b ON a.zone_id = b.zone_id
        AND a.ring_id = b.ring_id AND b.idx = a.idx + 1)
    """
    t_mid = f"(CAST(y1 + y2 AS DOUBLE) / 2.0) * {2.0 * PI / MAP_WIDTH}"
    seg_m = (f"sqrt(CAST((x2 - x1) * (x2 - x1) + (y2 - y1) * (y2 - y1) AS DOUBLE))"
             f" * {EARTH_CIRCUMFERENCE / MAP_WIDTH}"
             f" / ((exp({t_mid}) + exp(-({t_mid}))) / 2.0)")
    zone_geom_oracle = {
        "zone_shoelace": edges_cte + """
          , r AS (SELECT zone_id, ring_id, role,
                         SUM(x1 * y2 - x2 * y1) AS s2 FROM e GROUP BY 1, 2, 3)
          SELECT zone_id,
                 CAST(SUM(CASE WHEN role = 'outer' THEN abs(s2) ELSE -abs(s2) END) AS BIGINT)
                   AS shoelace2_net
          FROM r GROUP BY zone_id""",
        "zone_centroid": edges_cte + """
          , r AS (SELECT zone_id, ring_id, role,
                         CAST(SUM(x1 * y2 - x2 * y1) AS DOUBLE) AS rs,
                         SUM(CAST(x1 + x2 AS DOUBLE) * (x1 * y2 - x2 * y1)) AS cxs,
                         SUM(CAST(y1 + y2 AS DOUBLE) * (x1 * y2 - x2 * y1)) AS cys
                  FROM e GROUP BY 1, 2, 3),
          sgn AS (SELECT zone_id,
                         CASE WHEN rs >= 0 AND role = 'outer' THEN 1.0 ELSE -1.0 END AS sg,
                         rs, cxs, cys FROM r),
          z AS (SELECT zone_id, SUM(rs * sg) AS a, SUM(cxs * sg) AS cx,
                       SUM(cys * sg) AS cy FROM sgn GROUP BY 1)
          SELECT zone_id,
                 CAST(round(cx / (3.0 * a)) AS BIGINT) AS centroid_x,
                 CAST(round(cy / (3.0 * a)) AS BIGINT) AS centroid_y
          FROM z""",
        "zone_length": edges_cte + f"""
          , seg AS (SELECT zone_id, ring_id,
                           CAST(round(({seg_m}) * 100) AS BIGINT) AS cm FROM e)
          SELECT zone_id, CAST(SUM(cm) AS BIGINT) AS perimeter_cm
          FROM (SELECT zone_id, ring_id, CAST(SUM(cm) AS BIGINT) AS cm
                FROM seg GROUP BY 1, 2)
          GROUP BY zone_id""",
        "zone_bbox": f"""
          WITH v AS (SELECT * FROM {zone_vertices_values_sql()})
          SELECT zone_id, MIN(x) AS min_x, MIN(y) AS min_y,
                 MAX(x) AS max_x, MAX(y) AS max_y
          FROM v GROUP BY zone_id""",
    }
    # sinusoidal equal-area (LambertArea.h:44-85): project each vertex,
    # planar shoelace per ring, outer − inner net per zone, int m²
    _R_SIN = 6371000.0

    def _sin_px(x, y):
        return (f"{_R_SIN} * radians(CAST({x} AS DOUBLE) * 360.0 / "
                f"{MAP_WIDTH}) * cos(radians({_sin_lat(y)}))")

    def _sin_lat(y):
        return (f"(atan(exp(CAST({y} AS DOUBLE) * {2.0 * PI / MAP_WIDTH}))"
                f" * {360.0 / PI} - 90.0)")

    def _sin_py(y):
        return f"{_R_SIN} * radians({_sin_lat(y)})"

    zone_geom_oracle["zone_lambert_area"] = edges_cte + f"""
      , p AS (SELECT zone_id, ring_id, role,
               {_sin_px('x1', 'y1')} AS ax, {_sin_py('y1')} AS ay,
               {_sin_px('x2', 'y2')} AS bx, {_sin_py('y2')} AS "by"
        FROM e),
      r AS (SELECT zone_id, ring_id, role,
                   SUM(ax * "by" - bx * ay) / 2.0 AS s
            FROM p GROUP BY 1, 2, 3)
      SELECT zone_id,
             CAST(round(SUM(CASE WHEN role = 'outer' THEN abs(s)
                                 ELSE -abs(s) END)) AS BIGINT)
               AS lambert_m2
      FROM r GROUP BY zone_id"""


    def pyramid_sql():
        selects = []
        for z in PYRAMID_LEVELS:
            shift = 32 - z
            selects.append(
                f"SELECT {z} AS zoom, ({z} * 16777216) "
                f"+ (((2147483647 - y) >> {shift}) * 4096) "
                f"+ ((x + 2147483648) >> {shift}) AS cell, COUNT(*) AS n "
                f"FROM pts GROUP BY 1, 2")
        return pc + " " + " UNION ALL ".join(selects)

    mnx, mny, mxx, mxy = BBOX
    qx, qy = KNN_Q
    rx, ry = RADIUS_Q

    probes_values = ",".join(
        f"('{p}',CAST({x} AS BIGINT),CAST({y} AS BIGINT))" for p, x, y in PROBES)
    frag = locate_sql(GATE_ZONES["comb"])
    contains_sql = f"""
    WITH probes AS (SELECT * FROM (VALUES {probes_values}) AS t(probe_id, x, y)),
    loc AS (
      SELECT p.probe_id,
             SUM({frag['crossing']}) AS crossings,
             MAX({frag['on_seg']}) AS on_boundary
      FROM probes p CROSS JOIN {frag['edges']}
      GROUP BY p.probe_id)
    SELECT probe_id FROM loc WHERE on_boundary = 1 OR crossings % 2 = 1
    """

    def knn_sql(k):
        return f"""{pc}
        SELECT image_id, (x - {qx}) * (x - {qx}) + (y - {qy}) * (y - {qy}) AS sq_dist
        FROM pts ORDER BY sq_dist, image_id LIMIT {k}"""

    out = {
        "cell_assign": f"{pc} SELECT image_id, x, y, cell_id, salt FROM pts",
        "cell_pyramid": pyramid_sql(),
        "bbox_window": f"""{pc} SELECT image_id, cell_id FROM pts
            WHERE x >= {mnx} AND x <= {mxx} AND y >= {mny} AND y <= {mxy}""",
        "within_convex": within_sql(GATE_ZONES["convex"]),
        "within_comb": within_sql(GATE_ZONES["comb"]),
        "within_holed": within_sql(GATE_ZONES["holed"]),
        "intersects_comb": within_sql(GATE_ZONES["comb"], strict=False),
        "contains_point": contains_sql,
        "knn_k5": knn_sql(5),
        "knn_k50": knn_sql(50),
        "radius_500k": f"""{pc}
            SELECT image_id,
                   (x - {rx}) * (x - {rx}) + (y - {ry}) * (y - {ry}) AS sq_dist
            FROM pts
            WHERE (x - {rx}) * (x - {rx}) + (y - {ry}) * (y - {ry}) <= {RADIUS_SQ}""",
        "tile_stats": f"""{pc}
            SELECT cell_id, COUNT(*) AS n, MIN(x) AS min_x, MAX(x) AS max_x,
                   MIN(y) AS min_y, MAX(y) AS max_y,
                   CAST(SUM(phash % 997) AS BIGINT) AS phash_sum
            FROM pts GROUP BY cell_id""",
        "hot_cells": f"""{pc} SELECT cell_id, COUNT(*) AS n FROM pts
            GROUP BY cell_id HAVING COUNT(*) >= {HOT_THRESHOLD}""",
        "colocated_grid": f"""{pc}
            SELECT x >> 8 AS gx, y >> 8 AS gy, COUNT(*) AS n FROM pts
            GROUP BY 1, 2 HAVING COUNT(*) >= 2""",
        "tpch_q1": """
            SELECT l_returnflag, l_linestatus,
                   CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
                   CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_price_cents,
                   COUNT(*) AS count_order
            FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 12:00:00'
            GROUP BY l_returnflag, l_linestatus""",
        "events_by_type": """
            SELECT event_type, COUNT(*) AS n,
                   CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents,
                   COUNT(DISTINCT user_id) AS n_users
            FROM events GROUP BY event_type""",
        "orders_by_segment": """
            SELECT c_mktsegment, COUNT(*) AS n_orders,
                   CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY c_mktsegment""",
        "text_features": _textops().text_features_sql(),
        "exact_dedup": _dedup().exact_dedup_sql(),
        "simhash": _dedup().simhash_sql(),
        "simhash_near_dups": _dedup().simhash_near_dups_sql(),
        "minhash_lsh_pairs": _dedup().minhash_lsh_pairs_sql(50),
        "ngram_jaccard_pairs": _dedup().ngram_jaccard_pairs_sql(50),
        "ann_topk": _ann().brute_topk_sql(ANN_QIDS, 10),
        "goql_filter": """
            SELECT doc_id FROM documents
            WHERE lang IN ('en', 'fr') AND TRY_CAST(n_chars AS DOUBLE) > 300""",
        "goql_tags": """
            SELECT doc_id FROM documents
            WHERE lang IN ('en', 'fr') AND TRY_CAST(n_chars AS DOUBLE) > 300
              AND source LIKE 'src1%'""",
        "zorder_key": f"""{pc} SELECT image_id, {_writer().morton_key_sql()} AS zkey FROM pts""",
        "tile_captions": f"""{pc}
            SELECT cell_id,
                   CASE WHEN pid % 10 < 4 THEN 'png'
                        WHEN pid % 10 < 8 THEN 'jpeg' ELSE 'bmp' END AS fmt,
                   COUNT(*) AS n_images,
                   sha256(string_agg(
                       'caption ' || pid || ' — café "№' || (pid % 97) || '"'
                       || chr(0), '' ORDER BY image_id)) AS caption_sha
            FROM pts GROUP BY 1, 2""",
    }
    rel_ids = ",".join(str(i) for i in REL_IDS)
    probe_ids = ",".join(str(i) for i in MEMBER_PROBE_IDS)
    out.update(zone_geom_oracle)

    from libgeodesk_spark import mercator as _m
    from libgeodesk_spark.operators.knn import _ring_cells
    from libgeodesk_spark.sources.points import crossing_segments_sql
    out["crossing_segments"] = crossing_segments_sql(GATE_ZONES_COMB())
    from libgeodesk_spark.mercator import units_from_meters
    from libgeodesk_spark.sources.points import (
        rel_intersects_sql,
        rel_within_sql,
        way_distance_sql,
        way_intersects_sql,
        way_within_sql,
    )
    out["way_within"] = way_within_sql(GATE_ZONES_COMB())
    out["way_intersects"] = way_intersects_sql(GATE_ZONES_COMB())
    out["rel_within"] = rel_within_sql(GATE_ZONES_COMB())
    out["rel_intersects"] = rel_intersects_sql(GATE_ZONES_COMB())
    _wd_units = units_from_meters(WAY_DIST_METERS, KNN_Q[1])
    out["way_distance"] = way_distance_sql(KNN_Q[0], KNN_Q[1],
                                           _wd_units * _wd_units)
    out["stream_dedup"] = f"""{pc},
        k AS (SELECT phash % 256 AS key, image_id, pid FROM pts),
        g AS (SELECT key,
                     SUM(CASE WHEN pid % 2 = 0 THEN 1 ELSE 0 END) AS n_even,
                     MIN(CASE WHEN pid % 2 = 0 THEN image_id END) AS id_even,
                     MIN(image_id) AS id_any,
                     COUNT(*) AS n_all
              FROM k GROUP BY key)
        SELECT key,
               CASE WHEN n_even > 0 THEN id_even ELSE id_any END AS image_id,
               CAST(CASE WHEN n_even > 0 THEN n_even - 1
                         ELSE n_all - 1 END AS BIGINT) AS n_dups
        FROM g"""
    from libgeodesk_spark.sources.points import ways_vertices_sql
    out["nodes_of"] = f"""{pc}, {ways_vertices_sql()},
        fn AS (SELECT pid AS node_id, x, y FROM pts WHERE pid % 3 = 0)
        SELECT w.way_id, w.seq - 1 AS seq, w.x, w.y, fn.node_id
        FROM wv w LEFT JOIN fn ON fn.x = w.x AND fn.y = w.y"""
    _t_mid_w = "(CAST(y1 + y2 AS DOUBLE) / 2.0) * " \
        f"{2.0 * 3.14159265358979323846 / _m.MAP_WIDTH}"
    _seg_m_w = (
        "sqrt(CAST((x2 - x1) * (x2 - x1) + (y2 - y1) * (y2 - y1) AS DOUBLE))"
        f" * {_m.EARTH_CIRCUMFERENCE / _m.MAP_WIDTH}"
        f" / ((exp({_t_mid_w}) + exp(-({_t_mid_w}))) / 2.0)")
    out["way_length"] = f"""{pc}, {ways_vertices_sql()},
        seg AS (
          SELECT a.way_id, a.x AS x1, a.y AS y1, b.x AS x2, b.y AS y2
          FROM wv a JOIN wv b ON b.way_id = a.way_id AND b.seq = a.seq + 1)
        SELECT way_id,
               CAST(SUM(CAST(round(({_seg_m_w}) * 100) AS BIGINT)) AS BIGINT)
                 AS length_cm
        FROM seg GROUP BY way_id"""
    qcol = int(_m.col_from_x(KNN_Q[0], 12))
    qrow = int(_m.row_from_y(KNN_Q[1], 12))
    ring_cells = ",".join(
        str(c) for r in range(RING_R + 1) for c in _ring_cells(qcol, qrow, r, 12))
    out["cell_ring"] = f"""{pc}
        SELECT cell_id, COUNT(*) AS n FROM pts
        WHERE cell_id IN ({ring_cells}) GROUP BY cell_id"""
    dexpr = ("CAST(round(CAST(x[1] AS DOUBLE) * 1000) AS BIGINT)"
             " - CAST(round(CAST(x[2] AS DOUBLE) * 1000) AS BIGINT)")
    knnb = " UNION ALL ".join(
        f"SELECT '{q}' AS qid, image_id, "
        f"(x - {qx}) * (x - {qx}) + (y - {qy}) * (y - {qy}) AS sq_dist "
        f"FROM pts" for q, qx, qy in KNN_BATCH_QUERIES)
    out["knn_batch"] = f"""{pc}, allq AS ({knnb})
        SELECT qid, image_id, sq_dist, CAST(rank AS BIGINT) AS rank FROM (
          SELECT *, row_number() OVER (PARTITION BY qid
                    ORDER BY sq_dist, image_id) AS rank FROM allq)
        WHERE rank <= 10"""
    from libgeodesk_spark.operators.distance import distance_to_zone_sql
    out["distance_to_zone"] = distance_to_zone_sql(GATE_ZONES["convex"])
    out["user_sessions"] = """
        WITH marked AS (
          SELECT user_id,
                 CASE WHEN epoch(ts) - lag(epoch(ts))
                        OVER (PARTITION BY user_id ORDER BY ts) > 1800
                      OR lag(epoch(ts))
                        OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                      THEN 1 ELSE 0 END AS new_sess
          FROM events)
        SELECT user_id, CAST(SUM(new_sess) AS BIGINT) AS n_sessions,
               COUNT(*) AS n_events
        FROM marked GROUP BY user_id"""
    out["emb_near_dup"] = f"""
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               CAST(list_sum(list_transform(list_zip(a.embedding, b.embedding),
                    x -> ({dexpr}) * ({dexpr}))) AS BIGINT) AS d2
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE CAST(list_sum(list_transform(list_zip(a.embedding, b.embedding),
                    x -> ({dexpr}) * ({dexpr}))) AS BIGINT) <= {EMB_NEAR_D2}"""
    # watermark mirror (window-granular lateness): epoch-2 rows are kept
    # iff their window was still open at the epoch-1 watermark 88, i.e.
    # window end = (s//60)*60+60 > 88 <=> s >= 60; emitted windows = end
    # <= final watermark 149 (w0, w1); zoom-12 cell for
    # x=(pid%4)*2^20+10, y=10 is 209713152 + pid%4
    out["stream_window_counts"] = f"""{pc},
        ev AS (SELECT pid, pid % 4 AS g,
                      CASE WHEN pid % 2 = 0 THEN pid % 120
                           ELSE pid % 180 END AS s
               FROM pts),
        kept AS (SELECT * FROM ev WHERE pid % 2 = 0 OR s >= 60)
        SELECT CAST((s // 60) * 60 AS BIGINT) AS start_s,
               CAST(209713152 + g AS BIGINT) AS cell_id,
               COUNT(*) AS n
        FROM kept WHERE (s // 60) * 60 + 60 <= 149
        GROUP BY 1, 2"""
    from libgeodesk_spark.operators.pipeline import clean_corpus_sql
    out["clean_corpus"] = clean_corpus_sql()
    out["stream_join"] = """
        SELECT p.event_id AS p_id, p.user_id, v.event_id AS v_id
        FROM (SELECT event_id, user_id, ts FROM events
              WHERE event_type = 'purchase') p
        JOIN (SELECT event_id, user_id, ts FROM events
              WHERE event_type = 'view') v
          ON p.user_id = v.user_id
         AND v.ts BETWEEN p.ts - INTERVAL 1 HOUR AND p.ts"""
    out["asof_views"] = """
        WITH l AS (SELECT event_id, user_id, ts FROM events
                   WHERE event_type = 'purchase'),
             r AS (SELECT event_id, user_id, ts FROM events
                   WHERE event_type = 'view')
        SELECT l.event_id, l.user_id, r.event_id AS r_event_id
        FROM l ASOF LEFT JOIN r
          ON l.user_id = r.user_id AND l.ts >= r.ts"""
    from libgeodesk_spark.operators.knn import knn_join_sql
    out["knn_join"] = f"""{pc},
        {knn_join_sql(3, "pid % 97 = 0")}"""
    from libgeodesk_spark.operators.distance import within_distance_pairs_sql
    out["near_pairs"] = f"""{pc},
        {within_distance_pairs_sql(NEAR_PAIRS_R)}"""
    out["stream_sessions"] = f"""{pc},
        e1 AS (SELECT (pid >> 1) & 1 AS user_id, pid % 120 AS s
               FROM pts WHERE pid % 2 = 0)
        SELECT user_id, CAST(MIN(s) AS BIGINT) AS start_s,
               CAST(MAX(s) + 30 AS BIGINT) AS end_s,
               COUNT(*) AS n
        FROM e1 GROUP BY user_id"""
    out["snapshot_scan"] = f"""{pc}
        SELECT image_id, pid, cell_id FROM pts
        WHERE pid % 2 = 0
          AND cell_id BETWEEN {SNAP_CELL_RANGE[0]} AND {SNAP_CELL_RANGE[1]}"""
    out["snapshot_within"] = within_sql(GATE_ZONES["comb"])
    out["zoneprep_within"] = " UNION ALL ".join(
        f"""SELECT * FROM ({within_sql(rings,
                select_cols=f"image_id, '{name}' AS zone_id")})"""
        for name, rings in GATE_ZONES.items())
    out["snapshot_evolved"] = f"""{pc}
        SELECT image_id, pid, cell_id AS tile_id FROM pts"""
    out["stream_within"] = within_sql(GATE_ZONES["comb"])
    from libgeodesk_spark.operators.dedup import phash_near_dups_sql
    out["phash_near_dups"] = f"""{pc},
        imgs AS (
          SELECT image_id, phash FROM pts
          UNION ALL
          SELECT image_id || '_t' AS image_id,
                 xor(phash, CAST(1 AS BIGINT) << CAST(pid % 8 AS INT)) AS phash
          FROM pts WHERE pid % 50 = 0),
        {phash_near_dups_sql('imgs')}"""
    from libgeodesk_spark.sources.points import way_crossing_sql
    out["way_crossing"] = way_crossing_sql(GATE_ZONES_COMB())
    # recursive member walk: WITH RECURSIVE mirror of the BFS closure;
    # UNION dedups (root, member, mtype, depth) rows and the depth<32 cap
    # bounds cyclic recursion; MIN(depth) == BFS first-reach depth
    out["rel_members_recursive"] = f"""
        WITH RECURSIVE
        o AS (SELECT DISTINCT l_orderkey AS k FROM lineitem),
        r AS (SELECT k, row_number() OVER (ORDER BY k) - 1 AS i FROM o),
        memb AS (
          SELECT DISTINCT l_orderkey AS rel_id,
                 l_orderkey * 8 + l_linenumber AS member_id,
                 'way' AS mtype
          FROM lineitem
          UNION ALL
          SELECT a.k, b.k, 'relation'
          FROM r a JOIN r b ON b.i = a.i + 1 WHERE a.i % 8 <> 7
          UNION ALL
          SELECT b.k, a.k, 'relation'
          FROM r a JOIN r b ON b.i = a.i + 1 WHERE a.i % 8 = 0
        ),
        walk(root_id, member_id, mtype, depth) AS (
          SELECT rel_id, member_id, mtype, 1
          FROM memb WHERE rel_id IN ({rel_ids})
          UNION
          SELECT w.root_id, m.member_id, m.mtype, w.depth + 1
          FROM walk w JOIN memb m ON m.rel_id = w.member_id
          WHERE w.mtype = 'relation' AND w.depth < 32
        )
        SELECT root_id, member_id, mtype,
               CAST(MIN(depth) AS BIGINT) AS depth
        FROM walk GROUP BY 1, 2, 3"""
    out["stream_snapshot"] = f"""{pc}
        SELECT image_id, pid, cell_id FROM pts"""
    out["members_of"] = f"""
        SELECT DISTINCT l_orderkey AS rel_id,
               l_orderkey * 8 + l_linenumber AS member_id,
               CAST(l_linenumber AS VARCHAR) AS role
        FROM lineitem
        WHERE l_orderkey IN ({rel_ids}) AND l_linenumber IN (1, 2, 3)"""
    out["parents_of"] = f"""
        SELECT DISTINCT l_orderkey * 8 + l_linenumber AS member_id,
               l_orderkey AS rel_id
        FROM lineitem
        WHERE l_orderkey * 8 + l_linenumber IN ({probe_ids})"""
    return out


def GATE_ZONES_COMB():
    from libgeodesk_spark.sources.points import GATE_ZONES
    return GATE_ZONES["comb"]


def _writer():
    from libgeodesk_spark.sources import writer
    return writer


def _textops():
    from libgeodesk_spark.operators import textops
    return textops


def _dedup():
    from libgeodesk_spark.operators import dedup
    return dedup


def _ann():
    from libgeodesk_spark.operators import ann
    return ann
