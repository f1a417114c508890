"""Structured Streaming ingest: cell assignment as a streaming transform.

The reference is batch-only (SURVEY §2.9) — its incremental story is store
snapshots + resumable tile status. The engine keeps that stance for tile
re-writes (plans/lineage.py) and additionally offers a streaming ingest
path, because cell assignment is a stateless ``withColumn`` and composes
with Structured Streaming for free:

* ``stream_cell_assign`` — readStream → project to int Mercator + cell_id
  (pure Column math, fuses into the stream epoch) → append sink with
  checkpointing (exactly-once per epoch on the file sink).
* ``stream_cell_counts`` — event-time windowed per-cell counts with a
  watermark for late data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from libgeodesk_spark import mercator
from libgeodesk_spark.functions.cells import cell_id


def stream_cell_assign(spark: SparkSession, src_dir: str, schema: str,
                       zoom: int = mercator.MAX_ZOOM) -> DataFrame:
    """File-source stream of point rows (x, y, ... per ``schema``) with
    cell assignment applied; caller attaches the sink."""
    stream = spark.readStream.schema(schema).parquet(src_dir)
    return stream.withColumn("cell_id", cell_id(F.col("x"), F.col("y"), zoom))


def start_append_sink(df: DataFrame, out_dir: str, checkpoint_dir: str):
    return (df.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", checkpoint_dir)
            .outputMode("append")
            .trigger(availableNow=True)
            .start())


def stream_cell_counts(spark: SparkSession, src_dir: str, schema: str,
                       ts_col: str = "ts", window: str = "1 minute",
                       watermark: str = "2 minutes",
                       zoom: int = mercator.MAX_ZOOM) -> DataFrame:
    """Windowed per-cell event counts with late-data watermarking."""
    stream = spark.readStream.schema(schema).parquet(src_dir)
    tagged = stream.withColumn("cell_id", cell_id(F.col("x"), F.col("y"), zoom))
    return (tagged.withWatermark(ts_col, watermark)
            .groupBy(F.window(F.col(ts_col), window), F.col("cell_id"))
            .agg(F.count("*").alias("n")))
