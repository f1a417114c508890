"""Broadcast prepared-geometry spatial join: the Spark-native analog of the
reference's prepared filters (within / intersects / contains-point).

Reference execution shape (src/filter/WithinFilter.cpp, §3.2 of SURVEY.md):
build side = polygon → monotone chains → Hilbert R-tree, broadcast to every
tile scan; per tile ``acceptTile`` turbo-accepts tiles fully inside
(WithinFilter.cpp:164-171) and rejects tiles fully outside; only boundary
tiles run per-feature geometry.

Spark-first translation:

* build side: :class:`PreparedZone` per polygon (driver-side, once) →
  a tiny ``zone_cells`` DataFrame (cell_id, zone_id, cover) broadcast-joined
  against the points on ``cell_id`` — this is simultaneously the partition
  pruning (absent cells never match) and the turbo classification;
* probe side: INSIDE-cover matches accepted with zero geometry work in
  pure JVM; BOUNDARY-cover matches run the vectorized locate kernel in an
  Arrow-batched ``mapInPandas`` (no per-row Python).
* a bbox pre-filter (plain column range predicate) is pushed into the
  parquet/Iceberg scan for file/row-group skipping, mirroring the
  reference's bbox test ordering (TileQueryTask.cpp:176-203).

Scale notes (100 TB): the join is broadcast (zone_cells is tiny: #cells ×
#zones); no shuffle of the fact table at all. Callers should pass skinny
point frames (ids + x/y/cell) and re-attach heavy payload columns (image
bytes) by key afterwards, so bytes never cross the Python boundary.
"""

from __future__ import annotations

from typing import Iterable, Literal

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from libgeodesk_spark.geom import kernel
from libgeodesk_spark.geom.zones import BOUNDARY, INSIDE, PreparedZone

Predicate = Literal["within", "intersects", "contains_point"]

#: minimum locate() value accepted per predicate, for POINT candidates:
#: within → strictly inside (WithinFilter.cpp:60-63 properlyContainsPoint);
#: intersects / contains_point → boundary or inside
#: (IntersectsFilter.cpp, ContainsPointFilter.cpp:11-25).
_MIN_LOC = {"within": kernel.INSIDE, "intersects": kernel.BOUNDARY,
            "contains_point": kernel.BOUNDARY}


def zone_cells_df(spark: SparkSession, zones: Iterable[PreparedZone]) -> DataFrame:
    rows = [(int(c), z.zone_id, int(v))
            for z in zones for c, v in z.cover.items()]
    schema = T.StructType([
        T.StructField("cell_id", T.LongType(), False),
        T.StructField("zone_id", T.StringType(), False),
        T.StructField("cover", T.IntegerType(), False),
    ])
    return spark.createDataFrame(rows, schema)


def bbox_filter(df: DataFrame, min_x: int, min_y: int, max_x: int, max_y: int,
                x: str = "x", y: str = "y") -> DataFrame:
    """Plain range predicate — pushed down to the scan (P9 bbox window,
    FeaturesBase.h:85-97)."""
    return df.filter((F.col(x) >= min_x) & (F.col(x) <= max_x)
                     & (F.col(y) >= min_y) & (F.col(y) <= max_y))


def join_zones(points: DataFrame, zones: list[PreparedZone],
               predicate: Predicate = "within",
               cell_col: str = "cell_id", x_col: str = "x", y_col: str = "y",
               prefilter_bbox: bool = True) -> DataFrame:
    """points × zones point-in-polygon join.

    Returns the input columns plus ``zone_id`` — one row per (point, zone)
    membership, exactly matching the reference predicate semantics.
    """
    spark = points.sparkSession
    min_loc = _MIN_LOC[predicate]

    if prefilter_bbox and zones:
        mnx = min(z.bbox[0] for z in zones)
        mny = min(z.bbox[1] for z in zones)
        mxx = max(z.bbox[2] for z in zones)
        mxy = max(z.bbox[3] for z in zones)
        points = bbox_filter(points, mnx, mny, mxx, mxy, x_col, y_col)

    zc = zone_cells_df(spark, zones)
    cand = points.join(F.broadcast(zc), on=cell_col, how="inner")

    # turbo path: INSIDE-cover cells accept with no geometry work (pure JVM)
    turbo = cand.filter(F.col("cover") == INSIDE).drop("cover")

    # boundary path: vectorized locate in Arrow batches
    edges_bc = spark.sparkContext.broadcast(
        {z.zone_id: z.edges for z in zones})
    out_schema = turbo.schema

    def locate_batches(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            keep = np.zeros(len(pdf), dtype=bool)
            px = pdf[x_col].to_numpy()
            py = pdf[y_col].to_numpy()
            for zid, idx in pdf.groupby("zone_id").indices.items():
                edges = edges_bc.value[zid]
                loc = kernel.locate_points(px[idx], py[idx], edges)
                keep[idx] = loc >= min_loc
            yield pdf.loc[keep, [f.name for f in out_schema.fields]]

    boundary = (cand.filter(F.col("cover") == BOUNDARY).drop("cover")
                .mapInPandas(locate_batches, schema=out_schema))

    return turbo.unionByName(boundary)


def crossing_segments(segments: DataFrame, zones: list[PreparedZone],
                      x1="x1", y1="y1", x2="x2", y2="y2",
                      cell_col="cell_id") -> DataFrame:
    """Segments (one row per candidate segment, pre-tagged with a covering
    cell) that cross any zone edge — the `crossing(f)` analog
    (src/filter/CrossesFilter.cpp:10-41)."""
    spark = segments.sparkSession
    zc = zone_cells_df(spark, zones)
    cand = segments.join(F.broadcast(zc), on=cell_col, how="inner")
    edges_bc = spark.sparkContext.broadcast({z.zone_id: z.edges for z in zones})
    out_schema = cand.drop("cover").schema

    def cross_batches(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            keep = np.zeros(len(pdf), dtype=bool)
            for zid, idx in pdf.groupby("zone_id").indices.items():
                edges = edges_bc.value[zid]
                keep[idx] = kernel.any_segment_crosses(
                    pdf[x1].to_numpy()[idx], pdf[y1].to_numpy()[idx],
                    pdf[x2].to_numpy()[idx], pdf[y2].to_numpy()[idx], edges)
            yield pdf.loc[keep, [f.name for f in out_schema.fields]]

    return cand.drop("cover").mapInPandas(cross_batches, schema=out_schema) \
        .dropDuplicates()
