"""Grouped geometry ops: per-cell convex hulls, per-way simplification.

The GEOS-bridge analog surface (reference README "Optional integration
with GEOS"): hulls and simplify are the two ops OSM pipelines actually
run at scale (coverage footprints, geometry thinning before export).
Both group by a key and run the exact integer kernels of geom/hull.py
inside applyInPandas — work is per-group/per-ring, the fact table never
crosses into Python row-at-a-time.

Scale: cell_hulls shuffles (cell_id, x, y) triples once; hull output is
O(hull vertices) per cell. simplify_rings is a mapInPandas pass (no
shuffle) whose cost is the ring length — the same unit of work the
reference spends walking a way's coordinates.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from libgeodesk_spark.geom.hull import convex_hull, hull_area2, simplify_ring

_HULL_SCHEMA = T.StructType([
    T.StructField("cell_id", T.LongType(), False),
    T.StructField("n_points", T.LongType(), False),
    T.StructField("n_hull", T.LongType(), False),
    T.StructField("area2", T.LongType(), False),
])


def cell_hulls(points: DataFrame, id_col: str = "cell_id",
               x_col: str = "x", y_col: str = "y") -> DataFrame:
    """(cell_id, n_points, n_hull, area2) — minimal convex hull of each
    cell's points; area2 = exact twice-area (int shoelace)."""

    def agg(pdf: pd.DataFrame) -> pd.DataFrame:
        pts = np.column_stack([pdf[x_col].to_numpy(np.int64),
                               pdf[y_col].to_numpy(np.int64)])
        h = convex_hull(pts)
        return pd.DataFrame([{
            "cell_id": int(pdf[id_col].iloc[0]),
            "n_points": len(pdf),
            "n_hull": len(h),
            "area2": hull_area2(h),
        }])

    return points.groupBy(id_col).applyInPandas(agg, schema=_HULL_SCHEMA)


def simplify_rings(ways: DataFrame, eps: int,
                   ring_col: str = "ring") -> DataFrame:
    """Replace each way's ring with its Douglas-Peucker simplification
    (exact integer keep/drop decisions, endpoints preserved). Schema is
    unchanged; only the ring arrays shrink."""
    schema = ways.schema

    def go(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out = []
            for ring in pdf[ring_col]:
                pts = np.array([(p["x"], p["y"]) for p in ring],
                               dtype=np.int64)
                simp = simplify_ring(pts, eps)
                out.append([{"x": int(x), "y": int(y)} for x, y in simp])
            pdf = pdf.copy()
            pdf[ring_col] = out
            yield pdf

    return ways.mapInPandas(go, schema=schema)
