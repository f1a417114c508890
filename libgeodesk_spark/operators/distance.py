"""Distance-to-geometry: min point→zone distance (units²), inside = 0.

Reference semantics (src/filter/PointDistanceFilter.cpp:16-167): distance
from a probe to a polygon is 0 when the point lies inside; otherwise the
min point-segment squared distance over the boundary
(src/geom/Distance.cpp:8-37). Used as the exact refine step of radius
queries; exposed standalone here because training pipelines want
"distance to region" as a feature column.

The kernel runs float64 exactly like the reference; the DuckDB mirror in
``distance_to_zone_sql`` reproduces the identical expression tree so both
engines produce bit-equal doubles (inputs are ints < 2^26; every product
is exact in float64 except dot²/len whose single rounding is IEEE-identical).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from libgeodesk_spark.geom import kernel
from libgeodesk_spark.geom.zones import PreparedZone
from libgeodesk_spark.sources.points import (
    locate_sql,
    points_cte,
    zone_edges_values_sql,
)


def distance_to_zone(points: DataFrame, zone: PreparedZone,
                     id_col: str = "image_id",
                     x_col: str = "x", y_col: str = "y") -> DataFrame:
    """(id, d2) — min squared distance in Mercator units to the zone
    boundary, truncated to int64; 0 for inside-or-boundary points."""
    spark = points.sparkSession
    edges_bc = spark.sparkContext.broadcast(zone.edges)
    out_schema = T.StructType([
        points.schema[id_col],
        T.StructField("d2", T.LongType(), False),
    ])

    def go(batches):
        import pandas as pd
        for pdf in batches:
            if len(pdf) == 0:
                continue
            px = pdf[x_col].to_numpy()
            py = pdf[y_col].to_numpy()
            e = edges_bc.value
            best = np.full(len(pdf), np.inf)
            for ax, ay, bx, by in e:
                d = kernel.point_segment_sq_dist(ax, ay, bx, by, px, py)
                best = np.minimum(best, d)
            inside = kernel.locate_points(px, py, e) == kernel.INSIDE
            best[inside] = 0.0
            yield pd.DataFrame({id_col: pdf[id_col],
                                "d2": best.astype(np.int64)})

    return points.select(id_col, x_col, y_col).mapInPandas(go, schema=out_schema)


def _seg_d2_sql(px="p.x", py="p.y", ax="e.ax", ay="e.ay",
                bx="e.bx", by="e.by") -> str:
    """Mirror of kernel.point_segment_sq_dist: squared distance from point
    (px,py) to segment (ax,ay)-(bx,by) — exact expression-tree copy of
    Distance.cpp:8-37, reusable for zone edges AND way segments."""
    dx, dy = f"CAST({bx} - {ax} AS DOUBLE)", f"CAST({by} - {ay} AS DOUBLE)"
    qx, qy = f"CAST({px} - {ax} AS DOUBLE)", f"CAST({py} - {ay} AS DOUBLE)"
    dot1 = f"({qx} * {dx} + {qy} * {dy})"
    rx, ry = f"({dx} - {qx})", f"({dy} - {qy})"
    dot2 = f"({rx} * {dx} + {ry} * {dy})"
    seg = f"({dx} * {dx} + {dy} * {dy})"
    proj = (f"CASE WHEN {dot1} > 0 AND {dot2} > 0 AND {seg} > 0 "
            f"THEN {dot2} * {dot2} / {seg} ELSE 0.0 END")
    base = (f"CASE WHEN {dot1} <= 0 THEN ({qx} * {qx} + {qy} * {qy}) "
            f"ELSE ({rx} * {rx} + {ry} * {ry}) END")
    return f"greatest({base} - {proj}, 0.0)"


def distance_to_zone_sql(rings: list[list[tuple[int, int]]],
                         id_col: str = "image_id") -> str:
    frag = locate_sql(rings)
    return f"""
    {points_cte()},
    dist AS (
      SELECT p.{id_col}, MIN({_seg_d2_sql()}) AS min_d2,
             SUM({frag['crossing']}) AS crossings,
             MAX({frag['on_seg']}) AS on_boundary
      FROM pts p CROSS JOIN {zone_edges_values_sql(rings)}
      GROUP BY p.{id_col})
    SELECT {id_col},
           CAST(floor(CASE WHEN on_boundary = 0 AND crossings % 2 = 1
                           THEN 0.0 ELSE min_d2 END) AS BIGINT) AS d2
    FROM dist
    """
