"""knn_join megacity-tail fixture (VERDICT r4 #5): one zoom-12 cell
holding 30%+ of ALL candidate points, with a ring of sparse queries
adjacent to it. Sparse queries resolve at LATE rounds, where their 3×3
neighborhood includes the megacity cell — the shape whose per-(query,
cell) top-k window used to sort the cell's whole g-ball in ONE task.

Measures the salted first stage (KNN_W1_SALT) against the unsalted one
(monkeypatched to 1) on the same fixture: identical rows, and the wall
difference is the straggler. Also reports the bound arithmetic: final
window input per query ≤ 9·KNN_W1_SALT·k, first-stage partition ≤
cell_points/KNN_W1_SALT. Appends to BENCH/KNNJOIN.md.

Usage: python tools/knn_megacity_bench.py [n_total]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def fixture(spark, n_total: int):
    """30% of points uniform in one zoom-12 cell (extent 2^20 units);
    70% spread over a 512× wider region around it; 2,000 sparse queries
    in the empty band RIGHT NEXT to the dense cell (their kth neighbor
    is far → they resolve late, adjacent to the city)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    n_dense = int(n_total * 0.30)
    n_sparse = n_total - n_dense
    cell = 1 << 20
    ox, oy = 100_000_000, 640_000_000            # dense cell origin
    schema = T.StructType([T.StructField("pid", T.LongType(), False),
                           T.StructField("x", T.LongType(), False),
                           T.StructField("y", T.LongType(), False)])

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            rng = np.random.default_rng(1234 + int(ids[0]))
            dense = ids < n_dense
            x = np.empty(len(ids), dtype=np.int64)
            y = np.empty(len(ids), dtype=np.int64)
            nd = int(dense.sum())
            x[dense] = ox + rng.integers(0, cell, nd)
            y[dense] = oy + rng.integers(0, cell, nd)
            ns = len(ids) - nd
            x[~dense] = ox + rng.integers(-256 * cell, 256 * cell, ns)
            y[~dense] = oy + rng.integers(-256 * cell, 256 * cell, ns)
            yield pd.DataFrame({"pid": ids, "x": x, "y": y})

    pts = spark.range(n_total).repartition(64).mapInPandas(gen, schema)
    # sparse queries hugging the dense cell's east edge, spaced far
    # apart vertically so their own neighbors are distant
    qrows = [(10_000_000 + i, ox + cell + 50_000,
              oy - 200 * cell + i * (400 * cell // 2000))
             for i in range(2000)]
    q = spark.createDataFrame(qrows, schema)
    return pts, q


def main():
    import libgeodesk_spark.operators.knn as knn_mod
    from bench import build_spark

    n_total = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    spark = build_spark(int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")
    pts, q = fixture(spark, n_total)
    pts.persist().count()
    q.persist().count()
    k = 10

    def run():
        t0 = time.time()
        rows = sorted(map(tuple, knn_mod.knn_join(
            pts, k, queries=q).collect()))
        return rows, round(time.time() - t0, 2)

    salt = knn_mod.KNN_W1_SALT
    rows_salted, t_salted = run()
    knn_mod.KNN_W1_SALT = 1
    try:
        rows_unsalted, t_unsalted = run()
    finally:
        knn_mod.KNN_W1_SALT = salt
    assert rows_salted == rows_unsalted, "salt changed the answer"
    assert len(rows_salted) == 2000 * k

    n_dense = int(n_total * 0.30)
    raw = {"n_points": n_total, "dense_cell_points": n_dense,
           "n_queries": 2000, "k": k,
           "salt": salt, "wall_salted_sec": t_salted,
           "wall_unsalted_sec": t_unsalted,
           "rows": len(rows_salted), "identical": True,
           "w1_partition_bound": n_dense // salt,
           "final_window_bound_per_query": 9 * salt * k}
    md = f"""

## Megacity-tail fixture — salted first-stage window (r5)

{n_total:,} candidates, **{n_dense:,} (30%) in ONE zoom-12 cell**,
2,000 sparse queries adjacent to it (k={k}). The late rounds put the
whole city in those queries' 3×3 neighborhoods:

| first-stage window key | wall (s) |
|---|---|
| (query, cell) — unsalted | {t_unsalted} |
| (query, cell, id-hash %{salt}) — shipped | {t_salted} |

Output rows identical ({len(rows_salted):,}). The salt bounds the
largest single-task sort at cell_points/{salt} ≈
{n_dense // salt:,} rows (vs the cell's whole g-ball before) and the
final per-query window input at 9·{salt}·k = {9 * salt * k} rows.

Raw: `{json.dumps(raw)}`
"""
    with open(os.path.join(REPO, "BENCH", "KNNJOIN.md"), "a") as f:
        f.write(md)
    print(md)


if __name__ == "__main__":
    main()
