"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

Headline metric = spatial-join + tiling throughput in images/sec
(BASELINE.json): points are derived at the given SF and optionally
replicated ($SPARK_GRAFT_BENCH_REPL, default 4) with distinct pids to
stress the engine beyond the raw lineitem row count.

Per-query wall-clock seconds land in "queries"; the scaling-efficiency
companion (tools/scaling_bench.py) runs this same job at local[8] vs
local[32] and writes BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def build_spark(cpus: int):
    from pyspark.sql import SparkSession
    return (SparkSession.builder.master(f"local[{cpus}]")
            .appName("libgeodesk_spark-bench")
            .config("spark.sql.shuffle.partitions", str(cpus))
            .config("spark.sql.adaptive.enabled", "true")
            .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
            .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
            .config("spark.sql.execution.arrow.pyspark.enabled", "true")
            .config("spark.ui.enabled", "false")
            .config("spark.sql.session.timeZone", "UTC")
            .getOrCreate())


def bench_points(spark, sf_dir: str, repl: int):
    """Derived points × repl (distinct pids per replica) — deterministic."""
    from pyspark.sql import functions as F

    from libgeodesk_spark.sources.points import derived_points
    base = derived_points(spark, sf_dir)
    if repl <= 1:
        return base
    # shift pid per replica; re-derive x/y by adding a small deterministic
    # jitter so replicas are not stacked on identical coordinates
    r = F.explode(F.array(*[F.lit(i) for i in range(repl)])).alias("rep")
    rep = base.select("*", r)
    return (rep
            .withColumn("x", F.col("x") + (F.col("rep") * 7919) % 65536)
            .withColumn("y", F.col("y") + (F.col("rep") * 104729) % 65536)
            .withColumn("pid", F.col("pid") * repl + F.col("rep"))
            .withColumn("image_id", F.format_string("img%012d", F.col("pid")))
            .drop("rep"))


def run(spark, sf_dir: str, repl: int) -> dict:
    import numpy as np
    from pyspark.sql import functions as F

    from libgeodesk_spark.functions.cells import cell_id as cell_col
    from libgeodesk_spark.geom.zones import prepare_zone
    from libgeodesk_spark.operators.knn import knn
    from libgeodesk_spark.operators.spatial_join import join_zones
    from libgeodesk_spark.sources.points import GATE_ZONES

    zones = [prepare_zone(n, [np.array(r) for r in rings])
             for n, rings in GATE_ZONES.items()]

    pts = bench_points(spark, sf_dir, repl)
    n_images = pts.count()

    timings: dict[str, float] = {}

    def timed(name, fn):
        t0 = time.time()
        out = fn()
        timings[name] = round(time.time() - t0, 3)
        return out

    # tiling: cell assignment + multi-level pyramid rollup (pure JVM)
    def q_tiling():
        from __spark_entry__ import PYRAMID_LEVELS
        levels = F.array(*[
            F.struct(F.lit(z).alias("zoom"),
                     cell_col(F.col("x"), F.col("y"), z).alias("cell"))
            for z in PYRAMID_LEVELS])
        return (pts.select(F.explode(levels).alias("lc"))
                .groupBy("lc.zoom", "lc.cell").count().count())

    # spatial join: all three gate zones at once (within)
    def q_join():
        return join_zones(pts, zones, predicate="within") \
            .groupBy("zone_id").count().collect()

    def q_knn():
        from __spark_entry__ import KNN_Q
        return knn(pts, KNN_Q[0], KNN_Q[1], 50).count()

    timed("tiling_pyramid", q_tiling)
    join_out = timed("spatial_join_within", q_join)
    timed("knn_k50", q_knn)

    join_rows = sum(r["count"] for r in join_out)
    total = sum(timings.values())
    join_ips = n_images / timings["spatial_join_within"]
    return {
        "metric": "spatial_join_tiling_wall_seconds",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf_dir,
        "n_images": n_images,
        "join_rows": join_rows,
        "images_per_sec_spatial_join": round(join_ips),
        "images_per_sec_total": round(n_images * 3 / total),
    }


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    repl = int(os.environ.get("SPARK_GRAFT_BENCH_REPL", "4"))
    spark = build_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    # warm the JVM/codegen once at tiny scale so headline numbers measure
    # the engine, not session startup
    run(spark, "/root/testdata/sf0.001", 1)
    result = run(spark, sf_dir, repl)
    result["cpus"] = cpus
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
