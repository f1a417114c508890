"""kNN and radius queries via cell-ring expansion + exact distance refine.

Reference analog: ``maxMetersFrom`` converts the radius to a Mercator-unit
bbox pre-window at the query point's latitude
(src/filter/PointDistanceFilter.cpp:16-22, Mercator.h:169-172) and then
refines with exact point-segment distance (src/geom/Distance.cpp:8-37).
The reference has no kNN, only radius — kNN here is the distributed
generalization mandated by the north rule: start at the query's cell, scan
expanding Chebyshev rings of cells, stop when the k-th best squared
distance is strictly below the minimum possible distance to any unexplored
cell (the ring-expansion guarantee).

Distances are **exact int64 squared Mercator units** (point candidates),
so neighbor sets are bit-reproducible and tie-broken deterministically by
id. Cell-ring candidate pruning happens via an ``IN`` predicate on
``cell_id`` — partition-prunable on a cell-partitioned table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from libgeodesk_spark import mercator
from libgeodesk_spark.mercator import (
    cell_bounds,
    cell_from_col_row,
    col_from_x,
    row_from_y,
    units_from_meters,
)


def _ring_cells(qcol: int, qrow: int, r: int, zoom: int) -> list[int]:
    """Cells at Chebyshev distance exactly r from (qcol, qrow). Cells
    beyond the grid edge are skipped (clamped, NOT wrapped — the planar
    Mercator grid has no wraparound neighbors; Tile.h neighbor math is
    likewise planar)."""
    n = 1 << zoom
    if r == 0:
        return [int(cell_from_col_row(qcol, qrow, zoom))]
    cells = []
    for dc in range(-r, r + 1):
        for dr in (-r, r):
            c, w = qcol + dc, qrow + dr
            if 0 <= c < n and 0 <= w < n:
                cells.append(int(cell_from_col_row(c, w, zoom)))
    for dr in range(-r + 1, r):
        for dc in (-r, r):
            c, w = qcol + dc, qrow + dr
            if 0 <= c < n and 0 <= w < n:
                cells.append(int(cell_from_col_row(c, w, zoom)))
    return cells


def _covered_gap(qx: int, qy: int, qcol: int, qrow: int, r: int,
                 zoom: int) -> int | None:
    """Min distance (units) from (qx,qy) to any point OUTSIDE the covered
    box of rings 0..r. Sides clamped at the grid edge contribute no bound
    (there is nothing beyond them). Returns None when the whole grid is
    covered — no unexplored cell can beat any candidate."""
    n = 1 << zoom
    c0, c1 = max(qcol - r, 0), min(qcol + r, n - 1)
    r0, r1 = max(qrow - r, 0), min(qrow + r, n - 1)
    mnx, mny, _, _ = cell_bounds(int(cell_from_col_row(c0, r1, zoom)))
    _, _, mxx, mxy = cell_bounds(int(cell_from_col_row(c1, r0, zoom)))
    gaps = []
    if c0 > 0:
        gaps.append(qx - mnx + 1)
    if c1 < n - 1:
        gaps.append(mxx + 1 - qx)
    if r1 < n - 1:          # larger row = smaller y: south edge
        gaps.append(qy - mny + 1)
    if r0 > 0:
        gaps.append(mxy + 1 - qy)
    return min(gaps) if gaps else None


def sq_dist_col(x_col, y_col, qx: int, qy: int):
    """Exact integer squared distance Column (JVM arithmetic)."""
    dx = F.col(x_col).cast("long") - F.lit(qx)
    dy = F.col(y_col).cast("long") - F.lit(qy)
    return dx * dx + dy * dy


def knn(points: DataFrame, qx: int, qy: int, k: int,
        zoom: int = mercator.MAX_ZOOM,
        id_col: str = "image_id", x_col: str = "x", y_col: str = "y",
        cell_col: str = "cell_id", max_rings: int = 64) -> DataFrame:
    """Exact k nearest points to (qx,qy); deterministic tie-break by id.

    Iteratively expands cell rings; per iteration one Spark job over only
    the candidate cells (``cell_id IN ...`` — prunable), collecting at most
    k rows to the driver for the stop test. Returns a DataFrame
    (id, x, y, sq_dist) of exactly min(k, candidates) rows, built from the
    final collected top-k so downstream use is a local broadcastable frame.
    """
    spark = points.sparkSession
    qcol = int(col_from_x(qx, zoom))
    qrow = int(row_from_y(qy, zoom))
    sq = sq_dist_col(x_col, y_col, qx, qy).alias("sq_dist")

    seen_cells: list[int] = []
    best = None
    converged = False
    r = 0
    while r <= max_rings:
        seen_cells.extend(_ring_cells(qcol, qrow, r, zoom))
        cand = points.filter(F.col(cell_col).isin(seen_cells)) \
            .select(id_col, x_col, y_col, sq) \
            .orderBy("sq_dist", id_col).limit(k)
        best = cand.collect()
        # min possible squared distance to any cell beyond ring r: distance
        # from q to the outside of the covered box (grid-clamped)
        gap = _covered_gap(qx, qy, qcol, qrow, r, zoom)
        if gap is None:
            converged = True    # whole grid scanned — nothing left to beat
            break
        if len(best) >= k and best[k - 1]["sq_dist"] < gap * gap:
            converged = True
            break
        r += 1
    if not converged:
        raise RuntimeError(
            f"knn did not converge within max_rings={max_rings}; "
            f"raise max_rings or start at a coarser zoom")

    return spark.createDataFrame(best, schema=f"{id_col} string, {x_col} long, "
                                              f"{y_col} long, sq_dist long")


def knn_batch(points: DataFrame, queries: list[tuple], k: int,
              zoom: int = mercator.MAX_ZOOM,
              id_col: str = "image_id", x_col: str = "x", y_col: str = "y",
              cell_col: str = "cell_id", start_r: int = 1,
              max_rings: int = 64) -> DataFrame:
    """Exact kNN for MANY query points in one Spark job.

    queries = [(qid, qx, qy), ...]. Driver enumerates each query's cell
    rings (tiny), broadcast-joins (cell_id, qid) against the points, ranks
    by exact integer distance, and verifies the ring-expansion guarantee
    per query: if any query's k-th distance can be beaten outside its
    explored rings, those queries re-run with a wider radius. One shuffle
    (the window) over candidate rows only; the candidate scan is
    cell-IN-pruned. Results identical to per-query :func:`knn`.
    """
    import pandas as pd
    from pyspark.sql import Window

    spark = points.sparkSession
    pending = {qid: (int(qx), int(qy)) for qid, qx, qy in queries}
    out_frames = []
    r = start_r
    while pending and r <= max_rings:
        rows = []
        for qid, (qx, qy) in pending.items():
            qcol = int(col_from_x(qx, zoom))
            qrow = int(row_from_y(qy, zoom))
            for rr in range(r + 1):
                for c in _ring_cells(qcol, qrow, rr, zoom):
                    rows.append((qid, c, qx, qy))
        qcells = spark.createDataFrame(
            pd.DataFrame(rows, columns=["qid", cell_col, "qx", "qy"]))
        dx = F.col(x_col).cast("long") - F.col("qx")
        dy = F.col(y_col).cast("long") - F.col("qy")
        w = Window.partitionBy("qid").orderBy("sq_dist", id_col)
        topk = (points.join(F.broadcast(qcells), cell_col)
                .select("qid", id_col, x_col, y_col,
                        (dx * dx + dy * dy).alias("sq_dist"))
                .withColumn("rank", F.row_number().over(w))
                .filter(F.col("rank") <= k)).persist()
        # stop test folded into ONE aggregation: the driver receives one
        # (n, kth-distance) row per pending query, never k x |pending|
        # candidate rows — at 10^5 concurrent queries the per-iteration
        # driver transfer is |pending| rows instead of k x |pending|
        stats = {row["qid"]: (row["n"], row["kth"])
                 for row in topk.groupBy("qid")
                 .agg(F.count("*").alias("n"),
                      F.max("sq_dist").alias("kth")).collect()}
        done = []
        for qid, (qx, qy) in list(pending.items()):
            n, kth = stats.get(qid, (0, None))
            qcol = int(col_from_x(qx, zoom))
            qrow = int(row_from_y(qy, zoom))
            gap = _covered_gap(qx, qy, qcol, qrow, r, zoom)
            if gap is None or (n >= k and int(kth) < gap * gap):
                done.append(qid)
        if done:
            out_frames.append(
                topk.filter(F.col("qid").isin(done)).toPandas())
        topk.unpersist()
        for qid in done:
            del pending[qid]
        r *= 2
    if pending:
        raise RuntimeError(
            f"knn_batch: {sorted(pending)} did not converge within "
            f"max_rings={max_rings}; raise max_rings")
    result = pd.concat(out_frames, ignore_index=True) if out_frames else \
        pd.DataFrame(columns=["qid", id_col, x_col, y_col, "sq_dist", "rank"])
    return spark.createDataFrame(
        result, f"qid string, {id_col} string, {x_col} long, {y_col} long, "
                f"sq_dist long, rank long")


def radius_units(points: DataFrame, qx: int, qy: int, max_sq_units: float,
                 zoom: int = mercator.MAX_ZOOM,
                 x_col: str = "x", y_col: str = "y") -> DataFrame:
    """All points with squared distance ≤ max_sq_units: bbox pre-window
    (pushdown range predicate, the PointDistanceFilter.cpp:16-22 pattern)
    + exact refine. Pure JVM — no Python in the path."""
    import math
    d = int(math.isqrt(int(max_sq_units))) + 1
    pre = points.filter(
        (F.col(x_col) >= qx - d) & (F.col(x_col) <= qx + d)
        & (F.col(y_col) >= qy - d) & (F.col(y_col) <= qy + d))
    return pre.filter(sq_dist_col(x_col, y_col, qx, qy) <= F.lit(max_sq_units))


def max_meters_from(points: DataFrame, meters: float, qx: int, qy: int,
                    x_col: str = "x", y_col: str = "y") -> DataFrame:
    """maxMetersFrom(d, xy) for point candidates: meters → units at the
    query's y (PointDistanceFilter.cpp:16-22), then exact unit-space
    compare — identical semantics to the reference for nodes."""
    units = units_from_meters(meters, qy)
    return radius_units(points, qx, qy, units * units, x_col=x_col, y_col=y_col)
