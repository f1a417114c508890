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

    # -- field-id schema tracking (Iceberg schema-evolution analog) -----------
    #
    # The manifest carries the table's LOGICAL schema as (field_id, name,
    # type) rows plus, per writing commit, the PHYSICAL column name each
    # field id had at write time (``file_schemas``). Renames change only
    # the logical name (the id is stable — Iceberg's field-id contract);
    # drops remove the id from the logical schema while old files keep
    # their bytes (time travel still sees them through the OLD manifest's
    # schema). Reads project by id: physical name where the file has the
    # field, typed NULL where it predates the column.

    @staticmethod
    def _commit_of(entry: dict) -> str:
        if "commit" in entry:
            return entry["commit"]
        # legacy entry: data/<commit-id>/part-*.parquet
        return os.path.basename(os.path.dirname(entry["path"]))

    def _base_schema_state(self, spark, base_man: dict):
        """(schema rows, next_field_id, file_schemas) of the base
        manifest — synthesized once for legacy tables (pre-evolution
        manifests): ids in column order, every existing commit mapped
        to the same physical names."""
        if "schema" in base_man:
            return (list(base_man["schema"]), base_man["next_field_id"],
                    {k: dict(v) for k, v in base_man["file_schemas"].items()})
        if base_man["version"] == 0 or not base_man["files"]:
            return [], 1, {}
        files = [e["path"] for e in base_man["files"]]
        st = spark.read.option("mergeSchema", "true").parquet(*files).schema
        schema = [{"id": i + 1, "name": f.name,
                   "type": f.dataType.simpleString()}
                  for i, f in enumerate(st.fields)]
        ids = {c["name"]: str(c["id"]) for c in schema}
        # Per-COMMIT mapping restricted to the columns that commit's
        # files actually carry: legacy tables with add-column history
        # have heterogeneous physical schemas, and one shared mapping
        # would collapse them into a single _projected_scan group whose
        # plain read samples ONE footer and NULL-fills the rest
        # (ADVICE r4 — silent data loss on the legacy-upgrade path).
        by_commit: dict[str, list[str]] = {}
        for e in base_man["files"]:
            by_commit.setdefault(self._commit_of(e), []).append(e["path"])
        file_schemas = {}
        for cid, paths in by_commit.items():
            have = spark.read.option("mergeSchema", "true") \
                .parquet(*paths).schema.names
            file_schemas[cid] = {ids[n]: n for n in have}
        return schema, len(schema) + 1, file_schemas

    def rename_column(self, spark: SparkSession, old: str, new: str,
                      expected_base: int | None = None) -> int:
        """METADATA-ONLY commit: the field keeps its id (and its bytes in
        every data file); only the logical name changes. O(1) — no data
        rewrite, like Iceberg ALTER TABLE RENAME COLUMN."""
        return self._metadata_commit(spark, expected_base, rename=(old, new))

    def drop_column(self, spark: SparkSession, name: str,
                    expected_base: int | None = None) -> int:
        """METADATA-ONLY commit removing ``name`` from the logical
        schema. Data files are untouched; time travel to pre-drop
        snapshots still surfaces the column."""
        return self._metadata_commit(spark, expected_base, drop=name)

    def _metadata_commit(self, spark, expected_base,
                         rename: tuple[str, str] | None = None,
                         drop: str | None = None) -> int:
        base = self.current_version() if expected_base is None else expected_base
        base_man = self.manifest(base)
        schema, next_id, file_schemas = self._base_schema_state(spark, base_man)
        # pin stat FIELD IDS against the base schema BEFORE the rename/
        # drop mutates names — stats keep tracking the same field
        _, stat_ids = self._stat_names(base_man, schema)
        names = [c["name"] for c in schema]
        if rename is not None:
            old, new = rename
            if old not in names:
                raise ValueError(f"rename: no column {old!r}")
            if new in names:
                raise ValueError(f"rename: column {new!r} already exists")
            schema = [dict(c, name=new) if c["name"] == old else c
                      for c in schema]
        if drop is not None:
            if drop not in names:
                raise ValueError(f"drop: no column {drop!r}")
            schema = [c for c in schema if c["name"] != drop]
            if not schema:
                raise ValueError("drop would leave an empty schema")
        commit_id = uuid.uuid4().hex[:12]
        version = base + 1
        # legacy base (no cumulative tag index yet): fold the per-version
        # tags in, exactly as commit() does — a metadata-only commit must
        # not drop replay-protection tags
        if "tags" in base_man or base_man["version"] == 0:
            tags = list(base_man.get("tags", ()))
        else:
            tags = sorted(self.commit_tags())
        manifest = {"version": version, "base": base, "mode": "metadata",
                    "commit_id": commit_id, "files": base_man["files"],
                    "tag": None, "tags": tags,
                    "schema": schema, "next_field_id": next_id,
                    "file_schemas": file_schemas, "stat_ids": stat_ids}
        with open(self._manifest_path(version, commit_id), "w") as f:
            json.dump(manifest, f)
        try:
            with open(self._snap_path(version), "x") as f:
                json.dump({"version": version, "commit_id": commit_id}, f)
        except FileExistsError:
            os.remove(self._manifest_path(version, commit_id))
            raise CommitConflict(
                f"snapshot {version} already published; retry from "
                f"{self.current_version()}") from None
        return version

    # -- commit ----------------------------------------------------------------

    def _collect_stats(self, spark: SparkSession, files: list[str],
                       stat_names: tuple[str, ...]) -> list[dict]:
        """One distributed pass over the new files: per-file row count +
        min/max of the stat columns, grouped by input_file_name (Iceberg
        writes the same stats from the writing task; the contract —
        stats ride in the manifest, not in parquet footers — is
        identical). ``stat_names`` are the stat FIELDS' current logical
        names (they follow renames by field id)."""
        df = spark.read.parquet(*files)
        aggs = [F.count(F.lit(1)).alias("_rows")]
        for c in stat_names:
            aggs += [F.min(c).alias(f"_min_{c}"), F.max(c).alias(f"_max_{c}")]
        rows = (df.groupBy(F.input_file_name().alias("_file"))
                .agg(*aggs).collect())
        out = []
        for r in rows:
            ent = {"path": r["_file"].removeprefix("file://"),
                   "rows": r["_rows"],
                   "stats": {c: [r[f"_min_{c}"], r[f"_max_{c}"]]
                             for c in stat_names}}
            out.append(ent)
        return out

    def _stat_names(self, base_man: dict, schema: list[dict]) -> tuple:
        """Current logical names of the tracked stat fields: the field
        ids pinned at first commit (or the constructor's stat_cols names
        on a fresh/legacy table), intersected with the live schema —
        a dropped stat field just stops collecting."""
        by_id = {c["id"]: c["name"] for c in schema}
        if "stat_ids" in base_man:
            ids = base_man["stat_ids"]
        else:
            by_name = {c["name"]: c["id"] for c in schema}
            ids = [by_name[c] for c in self.stat_cols if c in by_name]
        return tuple(by_id[i] for i in ids if i in by_id), ids

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
        base_man = self.manifest(base)
        schema, next_id, file_schemas = \
            self._base_schema_state(spark, base_man)
        df_types = {f.name: f.dataType.simpleString()
                    for f in df.schema.fields}
        if base > 0:
            missing = [c["name"] for c in schema
                       if c["name"] not in df_types]
            retyped = [c["name"] for c in schema
                       if c["name"] in df_types
                       and df_types[c["name"]] != c["type"]]
            if missing or retyped:
                raise ValueError(
                    f"commit schema mismatch: missing={sorted(missing)} "
                    f"retyped={sorted(retyped)} — adds are implicit; "
                    f"removal/renames go through drop_column()/"
                    f"rename_column() (metadata-only commits)")
        names = {c["name"] for c in schema}
        for f in df.schema.fields:            # implicit add-column
            if f.name not in names:
                schema.append({"id": next_id, "name": f.name,
                               "type": f.dataType.simpleString()})
                next_id += 1
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
        stat_names, stat_ids = self._stat_names(base_man, schema)
        entries = self._collect_stats(spark, new_files, stat_names) \
            if new_files else []
        for e in entries:
            e["commit"] = commit_id
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
        all_files = prior + entries
        # physical names this commit wrote = logical schema at write time;
        # keep mappings only for commits the file list still references
        file_schemas[commit_id] = {str(c["id"]): c["name"] for c in schema}
        referenced = {self._commit_of(e) for e in all_files}
        file_schemas = {cid: m for cid, m in file_schemas.items()
                        if cid in referenced}
        manifest = {"version": version, "base": base, "mode": mode,
                    "commit_id": commit_id, "files": all_files,
                    "tag": tag, "tags": tags, "schema": schema,
                    "next_field_id": next_id, "file_schemas": file_schemas,
                    "stat_ids": stat_ids}
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
        """Full scan of a snapshot (time travel via ``snapshot_id``).

        Evolved tables resolve columns BY FIELD ID through the
        manifest's schema: renamed columns surface under the name the
        requested snapshot knew them by, dropped columns disappear
        (while older snapshots still serve them), and files predating an
        added column surface typed NULLs."""
        man = self.manifest(snapshot_id)
        if not man["files"]:
            raise ValueError("empty table (version 0)")
        if "schema" not in man:       # legacy manifest: name-based merge
            return spark.read.option("mergeSchema", "true").parquet(
                *[e["path"] for e in man["files"]])
        return self._projected_scan(spark, man, man["files"])

    def _projected_scan(self, spark: SparkSession, man: dict,
                        entries: list[dict]) -> DataFrame:
        """Field-id projection: group files by their write-time physical
        mapping (one group per schema epoch — a handful, not one per
        commit), scan each group once, alias physical → logical names,
        NULL-fill missing ids, union. Plan shape: k parallel parquet
        scans under one Union, each with full pushdown intact."""
        schema = man["schema"]
        fsch = man.get("file_schemas", {})
        groups: dict = {}
        for e in entries:
            mapping = fsch.get(self._commit_of(e))
            key = None if mapping is None else tuple(sorted(mapping.items()))
            groups.setdefault(key, (mapping, []))[1].append(e["path"])
        parts = []
        for mapping, paths in groups.values():
            if mapping is None:
                # Legacy (pre-evolution) commits share ONE synthesized
                # group but may span several physical schemas (old
                # add-column history). A plain read samples one footer
                # and silently NULL-fills columns absent there —
                # mergeSchema unions the footers so every legacy column
                # actually surfaces (ADVICE r4, silent data loss).
                df = spark.read.option("mergeSchema", "true").parquet(*paths)
            else:
                df = spark.read.parquet(*paths)
            have = set(df.columns)
            cols = []
            for c in schema:
                phys = c["name"] if mapping is None \
                    else mapping.get(str(c["id"]))
                if phys is not None and phys in have:
                    cols.append(F.col(phys).alias(c["name"]))
                else:
                    cols.append(F.lit(None).cast(c["type"]).alias(c["name"]))
            parts.append(df.select(*cols))
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

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
        ids = {c["name"]: str(c["id"]) for c in man.get("schema", ())}
        fsch = man.get("file_schemas", {})
        kept, pruned = [], 0
        for e in man["files"]:
            mapping = fsch.get(self._commit_of(e))
            ok = True
            for c, (lo, hi) in ranges.items():
                # stats are keyed by the PHYSICAL column name this file
                # was written under; resolve through the field id (a
                # renamed stat col keeps pruning; a file predating the
                # column has no stats → conservative keep, its rows are
                # NULL and die in the residual filter)
                phys = c if mapping is None else mapping.get(ids.get(c, ""))
                st = e.get("stats", {}).get(phys) if phys else None
                if st is None or st[0] is None:
                    continue
                if st[1] < lo or st[0] > hi:
                    ok = False
                    break
            if ok:
                kept.append(e)
            else:
                pruned += 1
        plan = {"version": man["version"], "files_kept": len(kept),
                "files_pruned": pruned}
        if not kept:
            # empty result with the snapshot's schema
            df = self.read(spark, snapshot_id).limit(0)
        elif "schema" not in man:
            df = spark.read.option("mergeSchema", "true").parquet(
                *[e["path"] for e in kept])
        else:
            df = self._projected_scan(spark, man, kept)
        cond = None
        for c, (lo, hi) in ranges.items():
            term = (F.col(c) >= F.lit(lo)) & (F.col(c) <= F.lit(hi))
            cond = term if cond is None else cond & term
        return (df.filter(cond) if cond is not None else df), plan
