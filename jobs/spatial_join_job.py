"""spark-submit entry point: the full spatial-join + tiling pipeline.

Deployment shape per the north rule: ``spark-submit --py-files
libgeodesk_spark.zip jobs/spatial_join_job.py --sf-dir ... --out ...``.
Build the zip with ``tools/make_pyfiles.sh``. On a cluster, drop the
``--master`` default and submit against YARN/K8s; the job only uses
SparkSession + the packaged modules.

Stages: derive/load points → write GOL layout (cell partitions, Z-order)
→ spatial join against the gate zones → per-tile re-encode metrics with
lineage-tracked resumable buckets → summary JSON on stdout.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--out", default="/tmp/spark_graft_job")
    ap.add_argument("--job-id", default="job-spatial-1")
    ap.add_argument("--buckets", type=int, default=8)
    args = ap.parse_args()

    import numpy as np
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = SparkSession.builder.appName("libgeodesk-spatial-join").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from libgeodesk_spark.geom.zones import prepare_zone
    from libgeodesk_spark.operators.spatial_join import join_zones
    from libgeodesk_spark.operators.tileagg import synth_reencode_metrics
    from libgeodesk_spark.plans.lineage import TileJob
    from libgeodesk_spark.sources.points import GATE_ZONES, derived_points
    from libgeodesk_spark.sources.writer import read_gol_layout, write_gol_layout

    t0 = time.time()
    pts = derived_points(spark, args.sf_dir)
    layout = f"{args.out}/gol"
    write_gol_layout(pts, layout)
    stored = read_gol_layout(spark, layout)
    n = stored.count()

    zones = [prepare_zone(name, [np.array(r) for r in rings])
             for name, rings in GATE_ZONES.items()]
    joined = join_zones(stored, zones, predicate="within",
                        columns=["image_id"]) \
        .groupBy("zone_id").count().collect()

    job = TileJob(f"{args.out}/tiles", args.job_id, n_buckets=args.buckets)
    summary = job.run(stored.select("pid", "image_id", "cell_id", "salt"),
                      synth_reencode_metrics)
    metrics = job.read_output(spark)
    psnr_ok = metrics.filter(F.col("min_psnr") >= 40.0).count()
    total_tiles = metrics.count()

    print(json.dumps({
        "n_images": n,
        "join_counts": {r["zone_id"]: r["count"] for r in joined},
        "tile_buckets": summary,
        "tiles": total_tiles,
        "tiles_psnr_ok": psnr_ok,
        "seconds": round(time.time() - t0, 2),
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
