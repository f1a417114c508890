"""SparkSession builder with the engine's recommended configuration.

Settings and the reasons they matter at 100 TB scale:

* AQE on (+ coalesce): runtime re-planning absorbs estimation errors and
  coalesces small shuffle partitions (north rule: "AQE-tuned shuffles").
* ``files.maxPartitionBytes`` lowered to 32 MB: the engine's hot-cell data
  layouts cluster dense cells into contiguous files; smaller splits spread
  a hot cell across tasks WITHOUT a shuffle (the cheap half of skew
  handling — the explicit ``spread_boundary`` repartition in join_zones is
  the expensive half for extreme cases).
* Arrow batches of 64k rows: the vectorized kernels (PIP locate, codec)
  amortize per-batch Python overhead; 10k default leaves ~40% of the
  boundary-path time in overhead.
* shuffle partitions sized to cores (local mode), not the 200 default.
* ``spark.local.dir`` on tmpfs when available: the sandbox's root disk is
  virtio ext4 mounted with ``discard`` — shuffle-file create/delete churn
  issues synchronous TRIMs that show up as 50%+ kernel time and 5x
  run-to-run variance on shuffle-heavy stages (measured: identical joins
  swinging 5.5-36.7 s with sys%>50). Shuffle scratch is ephemeral by
  definition, so tmpfs is safe; on a real cluster this maps to local NVMe
  or ramdisk scratch, standard practice.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def build_session(app: str = "libgeodesk_spark", cpus: int | None = None,
                  driver_mem: str | None = None, **extra) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    local_dir = os.environ.get("SPARK_GRAFT_LOCAL_DIR")
    if local_dir is None:
        shm = "/dev/shm"
        local_dir = (os.path.join(shm, "spark_local")
                     if os.path.isdir(shm) and os.access(shm, os.W_OK)
                     else None)
    b = (SparkSession.builder.master(f"local[{cpus}]").appName(app)
         .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
         .config("spark.sql.adaptive.advisoryPartitionSizeInBytes",
                 str(16 * 1024 * 1024))
         .config("spark.sql.files.maxPartitionBytes", str(32 * 1024 * 1024))
         .config("spark.sql.files.openCostInBytes", str(1024 * 1024))
         .config("spark.sql.execution.arrow.pyspark.enabled", "true")
         .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
         .config("spark.driver.memory",
                 driver_mem or os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.ui.enabled", "false"))
    if local_dir:
        b = b.config("spark.local.dir", local_dir)
    for k, v in extra.items():
        b = b.config(k, v)
    s = b.getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    return s
