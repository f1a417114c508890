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
        """Process every bucket not yet DONE. ``transform`` maps the bucket
        slice to its output. ``fail_bucket`` injects a failure AFTER
        processing-but-before-commit for tests. Returns a summary."""
        done = self.done_buckets()
        processed, skipped = [], []
        for b in range(self.n_buckets):
            if b in done:
                skipped.append(b)
                continue
            t0 = time.time()
            part = df.filter(F.col(self.bucket_col) % self.n_buckets == b)
            out = transform(part)
            final = os.path.join(self.out_dir, f"bucket={b}")
            tmp = final + f".tmp-{uuid.uuid4().hex[:8]}"
            n = out.count()
            out.write.mode("overwrite").parquet(tmp)
            if fail_bucket is not None and b == fail_bucket:
                shutil.rmtree(tmp, ignore_errors=True)
                raise RuntimeError(f"injected failure at bucket {b}")
            if os.path.exists(final):
                shutil.rmtree(final)
            os.rename(tmp, final)   # atomic commit of the bucket output
            rec = {"job_id": self.job_id, "bucket": b, "status": "DONE",
                   "rows": n, "seconds": round(time.time() - t0, 3),
                   "ts": time.time()}
            marker_tmp = self._marker(b) + ".tmp"
            with open(marker_tmp, "w") as f:
                json.dump(rec, f)
            os.rename(marker_tmp, self._marker(b))
            processed.append(b)
        return {"processed": processed, "skipped": skipped,
                "n_buckets": self.n_buckets}

    def read_output(self, spark) -> DataFrame:
        return spark.read.parquet(os.path.join(self.out_dir, "bucket=*"))
