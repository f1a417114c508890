"""Supplementary measurements (guide §1.4): each headline query isolated
with the noop sink so the computation is timed without its collect/agg
tail, plus the raw codec probes. Does NOT replace bench.py (frozen);
numbers are cited in OPTIMIZATION_r06.md.

Usage: SPARK_GRAFT_SF_DIR=... python bench_extra.py [trials]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    import numpy as np
    from pyspark.sql import functions as F

    import bench as B
    from libgeodesk_spark.functions.cells import cell_id as cell_col
    from libgeodesk_spark.geom.zones import prepare_zone
    from libgeodesk_spark.operators.knn import knn
    from libgeodesk_spark.operators.spatial_join import join_zones
    from libgeodesk_spark.operators.tileagg import synth_reencode_metrics
    from libgeodesk_spark.sources.points import GATE_ZONES, derived_points
    from libgeodesk_spark.sources.writer import scan_window
    from __spark_entry__ import KNN_Q, PYRAMID_LEVELS

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    trials = int(sys.argv[1]) if len(sys.argv) > 1 else 3

    probe = round(B.bandwidth_probe(120_000), 1)
    spark = B.build_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    repl = int(os.environ.get("SPARK_GRAFT_BENCH_REPL", "4"))
    pts = B.materialized_points(spark, sf_dir, repl)
    n_images = pts.count()
    zones = [prepare_zone(n, [np.array(r) for r in rings])
             for n, rings in GATE_ZONES.items()]

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    def q_tiling():
        levels = F.array(*[
            F.struct(F.lit(z).alias("zoom"),
                     cell_col(F.col("x"), F.col("y"), z).alias("cell"))
            for z in PYRAMID_LEVELS])
        noop(pts.select(F.explode(levels).alias("lc"))
             .groupBy("lc.zoom", "lc.cell").count())

    def q_window():
        noop(scan_window(pts, 90_000_000, 642_000_000,
                         94_000_000, 646_000_000))

    def q_join():
        noop(join_zones(pts, zones, predicate="within",
                        columns=["image_id"]).groupBy("zone_id").count())

    def q_knn():
        noop(knn(pts, KNN_Q[0], KNN_Q[1], 50))

    def q_reencode():
        noop(synth_reencode_metrics(derived_points(spark, sf_dir)))

    out: dict[str, list[float]] = {}
    for name, fn in [("tiling_pyramid", q_tiling), ("window_scan", q_window),
                     ("spatial_join_within", q_join), ("knn_k50", q_knn),
                     ("tile_reencode", q_reencode)]:
        spark.sparkContext.setJobDescription(f"bench_extra: {name}")
        ts = []
        for _ in range(trials):
            t0 = time.time()
            fn()
            ts.append(round(time.time() - t0, 3))
        out[name] = ts
        spark.sparkContext.setJobDescription(None)

    print(json.dumps({
        "metric": "noop_isolated_query_seconds",
        "sf": sf_dir, "cpus": cpus, "n_images": n_images,
        "bandwidth_probe": probe,
        "queries_trials": out,
        "queries_median": {k: sorted(v)[len(v) // 2] for k, v in out.items()},
    }))
    spark.stop()


if __name__ == "__main__":
    main()
