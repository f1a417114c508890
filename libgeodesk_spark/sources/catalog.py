"""Snapshot/manifest table format — the Iceberg-semantics analog.

The north rule targets Iceberg tables; the sandbox has no Iceberg runtime,
so this module implements the three Iceberg behaviors the engine relies
on, on plain parquet + JSON, with the same guarantees:

1. **Atomic snapshot commits + time travel** — a commit writes data files
   into an immutable staging dir, a commit-unique ``manifest-<v>-<cid>.json``
   listing them,
   then publishes ``snap-<v>.json`` with ``open(..., 'x')`` (exclusive
   create = the compare-and-swap of Iceberg's HadoopCatalog version-hint
   rename). Readers resolve the highest published snapshot (or any pinned
   ``snapshot_id``) and see either all of a commit or none of it; a crash
   before publish leaves dead files but a consistent table.
2. **Manifest-level file pruning** — each manifest row carries per-file
   row counts and min/max stats for the configured ``stat_cols``
   (collected DISTRIBUTED, one Spark pass over the new files grouped by
   ``input_file_name``; Iceberg collects the same stats task-side at
   write time). ``planned_scan`` intersects a predicate range against the
   manifest and opens only surviving files — at 100 TB / millions of
   files this prunes BEFORE any parquet footer is touched, which is the
   difference between a driver-side directory walk and a real query plan
   (reference analog: the tile-index walk prunes tiles before any tile
   page is mapped, src/query/TileIndexWalker.cpp:55-189).
3. **Optimistic concurrency** — two writers committing from the same base
   version race on the exclusive create; the loser gets
   ``CommitConflict`` and must retry on the new base (Iceberg's
   behavior).

Layout::

    table/
      data/<commit-uuid>/part-*.parquet   (immutable once published)
      manifest-<v>-<cid>.json             (immutable file list + stats)
      snap-<v>.json                       (snapshot pointer, created with 'x')

Scale notes: manifests here are one JSON per snapshot, fine to ~10^5
files; Iceberg splits manifests per partition subtree and this module's
``planned_scan`` contract (files-in → files-pruned-out) is unchanged by
that split. The stats pass reads only the newly written files once.
"""

from __future__ import annotations

import glob
import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class CommitConflict(Exception):
    """Another writer published this snapshot version first — retry."""


class SnapshotTable:
    def __init__(self, path: str, stat_cols: tuple[str, ...] = ()):
        self.path = path
        self.stat_cols = tuple(stat_cols)
        os.makedirs(path, exist_ok=True)

    # -- snapshot resolution --------------------------------------------------

    def _snap_path(self, version: int) -> str:
        return os.path.join(self.path, f"snap-{version}.json")

    def _manifest_path(self, version: int, commit_id: str) -> str:
        # commit-id-unique name: manifests are immutable once written, so
        # two writers racing on the same version can never overwrite each
        # other's manifest — the snap pointer's exclusive create alone
        # decides which manifest version v resolves to
        return os.path.join(self.path, f"manifest-{version}-{commit_id}.json")

    def current_version(self) -> int:
        """Highest PUBLISHED snapshot (0 = empty table)."""
        best = 0
        for p in glob.glob(os.path.join(self.path, "snap-*.json")):
            try:
                best = max(best, int(os.path.basename(p)[5:-5]))
            except ValueError:
                continue
        return best

    def _snap(self, version: int) -> dict:
        with open(self._snap_path(version)) as f:
            return json.load(f)

    def manifest(self, snapshot_id: int | None = None) -> dict:
        v = self.current_version() if snapshot_id is None else snapshot_id
        if v == 0:
            return {"version": 0, "files": []}
        # resolve THROUGH the snap pointer: only the manifest the winning
        # commit published is ever visible
        with open(self._manifest_path(v, self._snap(v)["commit_id"])) as f:
            return json.load(f)

    # -- commit ----------------------------------------------------------------

    def _collect_stats(self, spark: SparkSession, files: list[str]) -> list[dict]:
        """One distributed pass over the new files: per-file row count +
        min/max of stat_cols, grouped by input_file_name (Iceberg writes
        the same stats from the writing task; the contract — stats ride
        in the manifest, not in parquet footers — is identical)."""
        df = spark.read.parquet(*files)
        aggs = [F.count(F.lit(1)).alias("_rows")]
        for c in self.stat_cols:
            aggs += [F.min(c).alias(f"_min_{c}"), F.max(c).alias(f"_max_{c}")]
        rows = (df.groupBy(F.input_file_name().alias("_file"))
                .agg(*aggs).collect())
        out = []
        for r in rows:
            ent = {"path": r["_file"].removeprefix("file://"),
                   "rows": r["_rows"],
                   "stats": {c: [r[f"_min_{c}"], r[f"_max_{c}"]]
                             for c in self.stat_cols}}
            out.append(ent)
        return out

    def commit_tags(self) -> set[str]:
        """Idempotence tags of every commit EVER published (the Iceberg
        streaming-sink contract: each snapshot summary records the
        (queryId, epochId) that produced it, and a replayed epoch is
        skipped when its tag is already present).

        Each manifest carries the CUMULATIVE tag set of its whole commit
        history (``tags``), so this is one JSON read per call — not one
        per version (the naive per-epoch scan is quadratic over a
        stream's life) — and ``expire_snapshots`` deleting old manifests
        cannot lose a tag: the newest manifest still carries it, so a
        replayed pre-expiry epoch stays deduplicated (exactly-once
        survives retention). ~30 bytes/epoch of manifest overhead —
        10⁵ epochs ≈ 3 MB, the compact-tag-index trade Iceberg makes
        with its snapshot-summary log."""
        man = self.manifest()
        if "tags" in man or man["version"] == 0:
            return set(man.get("tags", ()))
        # legacy table (pre-tag-index manifests): one-time full scan
        out = set()
        for v in range(1, self.current_version() + 1):
            try:
                tag = self.manifest(v).get("tag")
            except FileNotFoundError:
                continue
            if tag:
                out.add(tag)
        return out

    def commit(self, df: DataFrame, mode: str = "append",
               expected_base: int | None = None,
               zorder_by: tuple[str, str] | None = None,
               tag: str | None = None) -> int:
        """Publish ``df`` as the next snapshot; returns its version.

        ``mode='append'`` keeps prior files; ``'overwrite'`` replaces the
        file list (old files stay on disk for time travel — Iceberg
        semantics; vacuuming expired snapshots is a separate concern).
        ``expected_base`` pins the optimistic-concurrency base version
        (defaults to the version observed now).

        ``zorder_by=(x_col, y_col)``: range-partition + sort the commit
        by the interleaved Morton key before writing (Iceberg's write
        ORDERED BY zorder — the same clustering sources/writer.py gives
        the GOL layout), so per-file min/max stats are tight and
        planned_scan prunes harder.

        Schema evolution (Iceberg add-column semantics): appends may
        carry MORE columns than earlier commits; reads merge schemas and
        old files surface NULLs for the new columns. Column REMOVAL or
        retyping is rejected here (Iceberg needs table-level metadata to
        do those safely; this format has per-file schemas only)."""
        if mode not in ("append", "overwrite"):
            raise ValueError(mode)
        spark = df.sparkSession
        base = self.current_version() if expected_base is None else expected_base
        if mode == "append" and base > 0:
            prior_schema = {f.name: f.dataType.simpleString()
                            for f in self.read(spark, base).schema.fields}
            new_schema = {f.name: f.dataType.simpleString()
                          for f in df.schema.fields}
            missing = set(prior_schema) - set(new_schema)
            retyped = {c for c in prior_schema.keys() & new_schema.keys()
                       if prior_schema[c] != new_schema[c]}
            if missing or retyped:
                raise ValueError(
                    f"append schema mismatch: missing={sorted(missing)} "
                    f"retyped={sorted(retyped)} — only ADDING columns is "
                    f"supported")
        if zorder_by is not None:
            from libgeodesk_spark.sources.writer import morton_key
            xc, yc = zorder_by
            zk = morton_key(F.col(xc), F.col(yc))
            # explicit partition count — a bare repartitionByRange is
            # AQE-coalescible and collapsed small commits to ONE file,
            # erasing the clustering (measured)
            n_files = max(df.rdd.getNumPartitions(), 1)
            df = df.repartitionByRange(n_files, zk).sortWithinPartitions(zk)
        commit_id = uuid.uuid4().hex[:12]
        data_dir = os.path.join(self.path, "data", commit_id)
        df.write.mode("error").parquet(data_dir)
        new_files = [p for p in glob.glob(os.path.join(data_dir, "*.parquet"))]
        entries = self._collect_stats(spark, new_files) if new_files else []
        base_man = self.manifest(base)
        prior = base_man["files"] if mode == "append" else []
        # cumulative tag index (see commit_tags): carried forward in BOTH
        # modes — overwrite replaces the file list, never commit history
        if "tags" in base_man or base_man["version"] == 0:
            tags = list(base_man.get("tags", ()))
        else:                       # legacy base: fold old per-version tags in
            tags = sorted(self.commit_tags())
        if tag and tag not in tags:
            tags.append(tag)
        version = base + 1
        manifest = {"version": version, "base": base, "mode": mode,
                    "commit_id": commit_id, "files": prior + entries,
                    "tag": tag, "tags": tags}
        # immutable, commit-unique manifest file — concurrent writers on
        # the same version write DIFFERENT files, so nothing to race on
        with open(self._manifest_path(version, commit_id), "w") as f:
            json.dump(manifest, f)
        # CAS publish: exclusive create loses to any concurrent writer;
        # readers resolve the manifest THROUGH this pointer, so a losing
        # writer's manifest is dead weight, never served (the earlier
        # shared-manifest design could publish the loser's file list
        # while reporting conflict to both writers)
        try:
            with open(self._snap_path(version), "x") as f:
                json.dump({"version": version, "commit_id": commit_id}, f)
        except FileExistsError:
            os.remove(self._manifest_path(version, commit_id))
            raise CommitConflict(
                f"snapshot {version} already published; retry from "
                f"{self.current_version()}") from None
        return version

    # -- maintenance -------------------------------------------------------

    def compact(self, spark: SparkSession, target_files: int = 8) -> int:
        """Rewrite the current snapshot's data into ``target_files``
        files (small-file compaction — the Iceberg rewrite_data_files
        action). Row-preserving by construction: the new snapshot is a
        coalesced rewrite of exactly the current file list; old files
        stay for time travel until expired."""
        df = self.read(spark).coalesce(target_files)
        return self.commit(df, mode="overwrite")

    def expire_snapshots(self, keep_last: int = 1) -> list[int]:
        """Drop snapshot/manifest records older than the newest
        ``keep_last`` and delete data files no surviving snapshot
        references (Iceberg expire_snapshots + orphan cleanup). Returns
        the expired version numbers. The CURRENT snapshot is never
        expired."""
        import os as _os
        current = self.current_version()
        versions = sorted(
            int(_os.path.basename(p)[5:-5])
            for p in glob.glob(os.path.join(self.path, "snap-*.json")))
        cut = versions[:-keep_last] if keep_last > 0 else versions[:-1]
        cut = [v for v in cut if v != current]
        live: set[str] = set()
        for v in versions:
            if v not in cut:
                live |= {e["path"] for e in self.manifest(v)["files"]}
        dead: set[str] = set()
        for v in cut:
            dead |= {e["path"] for e in self.manifest(v)["files"]}
        for p in dead - live:
            if os.path.exists(p):
                os.remove(p)
        for v in cut:
            mf = self._manifest_path(v, self._snap(v)["commit_id"])
            for f in (mf, self._snap_path(v)):
                if os.path.exists(f):
                    os.remove(f)
        return cut

    # -- reads -------------------------------------------------------------

    def read(self, spark: SparkSession,
             snapshot_id: int | None = None) -> DataFrame:
        """Full scan of a snapshot (time travel via ``snapshot_id``)."""
        files = [e["path"] for e in self.manifest(snapshot_id)["files"]]
        if not files:
            raise ValueError("empty table (version 0)")
        # mergeSchema: evolved tables mix file schemas; older files
        # surface NULLs for later-added columns (add-column evolution)
        return spark.read.option("mergeSchema", "true").parquet(*files)

    def planned_scan(self, spark: SparkSession,
                     ranges: dict[str, tuple], snapshot_id: int | None = None,
                     ) -> tuple[DataFrame, dict]:
        """Manifest-pruned scan: open only files whose [min,max] stats
        overlap every ``ranges[col] = (lo, hi)`` (closed intervals; a file
        with null stats for a col is kept — prune must be conservative).
        Returns (df, plan) where plan reports files kept/pruned — the
        evidence surface for 'the scan never opened pruned files'.

        The returned df still carries the residual predicate: manifest
        pruning is file-granular, rows inside kept files must re-filter
        (same two-level accept as the reference's tile walk + in-tile
        matcher)."""
        man = self.manifest(snapshot_id)
        kept, pruned = [], 0
        for e in man["files"]:
            ok = True
            for c, (lo, hi) in ranges.items():
                st = e.get("stats", {}).get(c)
                if st is None or st[0] is None:
                    continue
                if st[1] < lo or st[0] > hi:
                    ok = False
                    break
            if ok:
                kept.append(e["path"])
            else:
                pruned += 1
        plan = {"version": man["version"], "files_kept": len(kept),
                "files_pruned": pruned}
        if not kept:
            # empty result with the snapshot's schema
            df = self.read(spark, snapshot_id).limit(0)
        else:
            df = spark.read.option("mergeSchema", "true").parquet(*kept)
        cond = None
        for c, (lo, hi) in ranges.items():
            term = (F.col(c) >= F.lit(lo)) & (F.col(c) <= F.lit(hi))
            cond = term if cond is None else cond & term
        return (df.filter(cond) if cond is not None else df), plan
