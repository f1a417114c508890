"""Per-partition lineage + idempotent resume for tile batch jobs.

The reference's tile index is a status machine per tile — MISSING_OR_STALE
/ CURRENT / CURRENT_WITH_MODIFIED (TileIndexEntry.h) — updated by a
journaled transaction that swaps whole tile pages
(FeatureStore_Transaction.cpp:99-112, FreeStore_Journal.cpp). The engine's
analog per the north rule: a batch job over an Iceberg/parquet table is
split into deterministic *tile buckets*; each bucket's output commits
atomically with a lineage record; a re-run (after any failure) skips DONE
buckets and reprocesses the rest — exactly-once per bucket via
write-temp-then-rename.

On a real cluster this maps 1:1 onto Iceberg partition overwrites with a
lineage table; locally we implement the same contract on the filesystem:

    out_dir/
      _lineage/<job_id>/<bucket>.json     (commit marker + metrics)
      bucket=<k>/part-*.parquet           (bucket output)

Buckets are ``cell_id % n_buckets`` by default — deterministic, stable
across retries and executors.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid
from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class TileJob:
    def __init__(self, out_dir: str, job_id: str, n_buckets: int = 16,
                 bucket_col: str = "cell_id"):
        self.out_dir = out_dir
        self.job_id = job_id
        self.n_buckets = n_buckets
        self.bucket_col = bucket_col
        self.lineage_dir = os.path.join(out_dir, "_lineage", job_id)
        os.makedirs(self.lineage_dir, exist_ok=True)

    # -- lineage records ----------------------------------------------------

    def _marker(self, bucket: int) -> str:
        return os.path.join(self.lineage_dir, f"{bucket}.json")

    def done_buckets(self) -> set[int]:
        out = set()
        for name in os.listdir(self.lineage_dir):
            if name.endswith(".json"):
                try:
                    rec = json.load(open(os.path.join(self.lineage_dir, name)))
                    if rec.get("status") == "DONE":
                        out.add(int(rec["bucket"]))
                except (ValueError, KeyError):
                    continue
        return out

    def lineage(self) -> list[dict]:
        recs = []
        for name in sorted(os.listdir(self.lineage_dir)):
            if name.endswith(".json"):
                recs.append(json.load(open(os.path.join(self.lineage_dir, name))))
        return recs

    # -- run ----------------------------------------------------------------

    def run(self, df: DataFrame,
            transform: Callable[[DataFrame], DataFrame],
            fail_bucket: int | None = None) -> dict:
        """Process every bucket not yet DONE — in ONE pass over the input.

        The pending buckets are filtered and transformed together, written
        ``partitionBy(bucket)`` into a staging dir (one scan of the input,
        one write), then each bucket directory is atomically renamed into
        place with its commit marker, in bucket order. A crash between
        commits leaves earlier buckets DONE and later ones pending — the
        rerun reprocesses only those (same exactly-once contract as the
        reference's per-tile page swap, FeatureStore_Transaction.cpp:99-112,
        without the old one-scan-per-bucket rescan).

        ``transform`` maps the pending slice to its output and must keep
        ``bucket_col``; per-bucket groupings are safe because bucket =
        bucket_col % n never splits a group. ``fail_bucket`` injects a
        failure BEFORE that bucket's commit (tests)."""
        done = self.done_buckets()
        pending = [b for b in range(self.n_buckets) if b not in done]
        skipped = sorted(done)
        if not pending:
            return {"processed": [], "skipped": skipped,
                    "n_buckets": self.n_buckets}
        t0 = time.time()
        spark = df.sparkSession
        part = df.withColumn("bucket", F.col(self.bucket_col) % self.n_buckets) \
            .filter(F.col("bucket").isin(pending))
        out = transform(part)
        if "bucket" not in out.columns:
            out = out.withColumn(
                "bucket", F.col(self.bucket_col) % self.n_buckets)
        staging = os.path.join(self.out_dir,
                               f"_staging-{uuid.uuid4().hex[:8]}")
        out.write.mode("overwrite").partitionBy("bucket").parquet(staging)
        # row counts from the written files' footers — no input rescan
        try:
            counts = {r["bucket"]: r["count"] for r in
                      spark.read.parquet(staging).groupBy("bucket")
                      .count().collect()}
        except Exception:
            counts = {}   # no data files: every pending bucket was empty
        write_secs = round(time.time() - t0, 3)

        processed = []
        try:
            for b in pending:
                if fail_bucket is not None and b == fail_bucket:
                    raise RuntimeError(f"injected failure at bucket {b}")
                src = os.path.join(staging, f"bucket={b}")
                final = os.path.join(self.out_dir, f"bucket={b}")
                if os.path.exists(final):
                    shutil.rmtree(final)
                if os.path.exists(src):
                    os.rename(src, final)   # atomic commit of the bucket
                else:
                    os.makedirs(final, exist_ok=True)   # empty bucket
                rec = {"job_id": self.job_id, "bucket": b, "status": "DONE",
                       "rows": int(counts.get(b, 0)),
                       "seconds": write_secs, "ts": time.time()}
                marker_tmp = self._marker(b) + ".tmp"
                with open(marker_tmp, "w") as f:
                    json.dump(rec, f)
                os.rename(marker_tmp, self._marker(b))
                processed.append(b)
        finally:
            shutil.rmtree(staging, ignore_errors=True)
        return {"processed": processed, "skipped": skipped,
                "n_buckets": self.n_buckets}

    def read_output(self, spark) -> DataFrame:
        return spark.read.parquet(os.path.join(self.out_dir, "bucket=*"))
