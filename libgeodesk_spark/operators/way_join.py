"""Spatial predicates for WAY/polyline candidates (not just points).

Reproduces the reference's candidate-geometry semantics exactly:

* within (src/filter/WithinFilter.cpp:21-57):
  - any vertex outside (locate < 0) → reject;
  - any vertex strictly inside (locate > 0) → accept;
  - ALL vertices on the boundary → linestrings reject (a line lying on
    the boundary is not within); AREA ways fall back to the centroid test
    (geodesk-py issue #57: equal polygons are within each other, but a
    boundary-hugging ring outside is not) — Centroid::ofWay semantics.
* intersects (src/filter/IntersectsFilter.cpp:36-75):
  accept iff any vertex locates >= 0 (boundary or inside), OR any segment
  crosses a zone edge, OR the candidate AREA contains the zone (tested via
  the zone's first vertex inside the candidate ring).
* crossing (src/filter/CrossesFilter.cpp:10-41): any segment intersects
  any zone edge.

Ways arrive as ``array<struct<x:long,y:long>>`` ring/line columns; each
Arrow batch runs the numpy kernel per way — vectorized per way, zero
per-row Python at the Spark layer.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from libgeodesk_spark.geom import kernel
from libgeodesk_spark.geom.zones import PreparedZone, rings_to_edges


def _locate_way(xs: np.ndarray, ys: np.ndarray, edges: np.ndarray) -> int:
    """-1 any-vertex-outside / 1 any-vertex-inside / 0 all-on-boundary
    (reference locateWayNodes, WithinFilter.cpp:238-253)."""
    loc = kernel.locate_points(xs, ys, edges)
    if (loc < 0).any():
        return -1
    if (loc > 0).any():
        return 1
    return 0


def way_within(ways: DataFrame, zone: PreparedZone,
               ring_col: str = "ring", id_col: str = "way_id",
               is_area_col: str = "is_area") -> DataFrame:
    """Ways entirely within the zone, exact reference semantics."""
    spark = ways.sparkSession
    edges_bc = spark.sparkContext.broadcast(zone.edges)
    out_schema = T.StructType([ways.schema[id_col]])

    def go(batches):
        for pdf in batches:
            keep = []
            for _, row in pdf.iterrows():
                pts = np.array([[p["x"], p["y"]] for p in row[ring_col]],
                               dtype=np.int64)
                loc = _locate_way(pts[:, 0], pts[:, 1], edges_bc.value)
                if loc < 0:
                    keep.append(False)
                elif loc > 0:
                    keep.append(True)
                elif not row[is_area_col]:
                    keep.append(False)   # boundary-only linestring: not within
                else:
                    # all vertices on boundary: centroid decides (issue #57)
                    cx, cy = kernel.areal_centroid([(pts[:, 0], pts[:, 1])])
                    keep.append(bool(kernel.locate_points(
                        [cx], [cy], edges_bc.value)[0] == kernel.INSIDE))
            yield pdf.loc[keep, [id_col]]

    return ways.mapInPandas(go, schema=out_schema)


def way_intersects(ways: DataFrame, zone: PreparedZone,
                   ring_col: str = "ring", id_col: str = "way_id",
                   is_area_col: str = "is_area") -> DataFrame:
    """Ways whose geometry intersects the zone (IntersectsFilter.cpp:36-75)."""
    spark = ways.sparkSession
    edges_bc = spark.sparkContext.broadcast(zone.edges)
    zone_probe = (int(zone.edges[0, 0]), int(zone.edges[0, 1]))
    out_schema = T.StructType([ways.schema[id_col]])

    def go(batches):
        for pdf in batches:
            keep = []
            for _, row in pdf.iterrows():
                pts = np.array([[p["x"], p["y"]] for p in row[ring_col]],
                               dtype=np.int64)
                xs, ys = pts[:, 0], pts[:, 1]
                loc = kernel.locate_points(xs, ys, edges_bc.value)
                if (loc >= 0).any():
                    keep.append(True)
                    continue
                crosses = kernel.any_segment_crosses(
                    xs[:-1], ys[:-1], xs[1:], ys[1:], edges_bc.value)
                if crosses.any():
                    keep.append(True)
                    continue
                if row[is_area_col]:
                    way_edges = rings_to_edges([pts])
                    inside = kernel.locate_points(
                        [zone_probe[0]], [zone_probe[1]], way_edges)[0]
                    keep.append(bool(inside >= 0))
                else:
                    keep.append(False)
            yield pdf.loc[keep, [id_col]]

    return ways.mapInPandas(go, schema=out_schema)
