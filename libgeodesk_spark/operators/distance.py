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
    (px,py) to segment (ax,ay)-(bx,by) — same branch structure as
    Distance.cpp:8-37 with the interior case in CROSS form (cross²/|d|²),
    the identical expression tree as the numpy kernel: both sides floor
    to int64, so the two formulations must agree to the bit (see the
    kernel docstring for the 2^53 cancellation this avoids). Reusable
    for zone edges AND way segments."""
    dx, dy = f"CAST({bx} - {ax} AS DOUBLE)", f"CAST({by} - {ay} AS DOUBLE)"
    qx, qy = f"CAST({px} - {ax} AS DOUBLE)", f"CAST({py} - {ay} AS DOUBLE)"
    dot1 = f"({qx} * {dx} + {qy} * {dy})"
    rx, ry = f"({dx} - {qx})", f"({dy} - {qy})"
    dot2 = f"({rx} * {dx} + {ry} * {dy})"
    seg = f"({dx} * {dx} + {dy} * {dy})"
    cross = f"({qx} * {dy} - {qy} * {dx})"
    ends = (f"CASE WHEN {dot1} <= 0 THEN ({qx} * {qx} + {qy} * {qy}) "
            f"ELSE ({rx} * {rx} + {ry} * {ry}) END")
    return (f"CASE WHEN {dot1} > 0 AND {dot2} > 0 AND {seg} > 0 "
            f"THEN {cross} * {cross} / {seg} ELSE {ends} END")


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


# ---------------------------------------------------------------------------
# within-distance pair join (spatial self-join, all pairs with d <= r)
# ---------------------------------------------------------------------------

def within_distance_pairs(points: DataFrame, r_units: int,
                          id_col: str = "pid",
                          x_col: str = "x", y_col: str = "y") -> DataFrame:
    """All unordered pairs (id_a < id_b) with squared distance <= r².

    The all-pairs analog of maxMetersFrom (the reference filters
    candidates of ONE query point, PointDistanceFilter.cpp:16-167; a
    training pipeline wants every co-located pair — e.g. burst/near-GPS
    image groups). Grid-bucketed band join, pure JVM:

    * grid cell g = smallest power of two >= r, so any pair within r
      lies in the 3x3 cell neighborhood — one side explodes to its 9
      neighbor keys (9 skinny rows), the other keeps 1 row/point, the
      join is equi on (gx, gy) and the exact int64 distance filter
      streams out of it. A pair matches exactly once (b's cell equals
      exactly one of a's neighbor keys) so no distinct pass.
    * SKEW IS OUTPUT-DRIVEN: a cell with n points within r of each other
      genuinely owes ~n²/2 result rows; the grid bounds the CANDIDATE
      blowup to the same order as the output (9x), which no partitioning
      scheme can beat. At 100 TB, size r's grid so the p99 bucket fits
      an executor (same playbook as tileagg salt_hot).

    From Spark's side this is one shuffle on the grid key; Catalyst
    cannot derive the neighborhood expansion itself (it's a band join),
    which is why it's an operator and not a WHERE clause.
    """
    from pyspark.sql import functions as F
    g = 1 << max(1, int(r_units - 1).bit_length())   # power of two >= r
    # arithmetic shift keeps floor semantics for negative coords
    shift = g.bit_length() - 1
    base = points.select(
        F.col(id_col).alias("id"),
        F.col(x_col).alias("px"), F.col(y_col).alias("py"),
        F.shiftright(F.col(x_col), shift).alias("gx"),
        F.shiftright(F.col(y_col), shift).alias("gy"))
    neigh = F.explode(F.array(*[
        F.struct((F.col("gx") + dx).alias("nx"), (F.col("gy") + dy).alias("ny"))
        for dx in (-1, 0, 1) for dy in (-1, 0, 1)])).alias("nb")
    a = base.select("id", "px", "py", neigh) \
        .select("id", "px", "py", F.col("nb.nx").alias("nx"),
                F.col("nb.ny").alias("ny"))
    b = base.select(F.col("id").alias("id_b"), F.col("px").alias("bx"),
                    F.col("py").alias("by"), "gx", "gy")
    dx = F.col("px") - F.col("bx")
    dy = F.col("py") - F.col("by")
    d2 = (dx * dx + dy * dy).alias("d2")
    return (a.join(b, (F.col("nx") == F.col("gx"))
                   & (F.col("ny") == F.col("gy"))
                   & (F.col("id") < F.col("id_b")))
            .select(F.col("id").alias("id_a"), "id_b", d2)
            .filter(F.col("d2") <= F.lit(int(r_units) * int(r_units))))


def within_distance_pairs_sql(r_units: int, pts_cte: str = "pts",
                              id_col: str = "pid") -> str:
    """DuckDB mirror: same grid band join (a naive cross join at sf0.01
    is 2·10⁹ pairs — the oracle uses the identical neighborhood logic,
    which is exact for any r <= grid size by the same argument)."""
    g = 1 << max(1, int(r_units - 1).bit_length())
    shift = g.bit_length() - 1
    r2 = int(r_units) * int(r_units)
    return f"""
    grid AS (SELECT {id_col} AS id, x AS px, y AS py,
                    x >> {shift} AS gx, y >> {shift} AS gy FROM {pts_cte})
    SELECT a.id AS id_a, b.id AS id_b,
           (a.px - b.px) * (a.px - b.px)
         + (a.py - b.py) * (a.py - b.py) AS d2
    FROM grid a JOIN grid b
      ON b.gx BETWEEN a.gx - 1 AND a.gx + 1
     AND b.gy BETWEEN a.gy - 1 AND a.gy + 1
     AND a.id < b.id
    WHERE (a.px - b.px) * (a.px - b.px)
        + (a.py - b.py) * (a.py - b.py) <= {r2}
    """
