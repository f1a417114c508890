"""Snapshot/manifest table format: atomicity, time travel, manifest
pruning, optimistic concurrency (sources/catalog.py)."""

import glob
import json
import os

import pytest
from pyspark.sql import functions as F

from libgeodesk_spark.sources.catalog import CommitConflict, SnapshotTable


@pytest.fixture()
def tbl(tmp_path):
    return SnapshotTable(str(tmp_path / "t"), stat_cols=("cell_id",))


def _mk(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("pid"), (F.col("id") * 7 % 100).alias("cell_id"))


class TestSnapshotTable:
    def test_append_and_time_travel(self, spark, tbl):
        v1 = tbl.commit(_mk(spark, 0, 100))
        v2 = tbl.commit(_mk(spark, 100, 150))
        assert (v1, v2) == (1, 2)
        assert tbl.read(spark, snapshot_id=1).count() == 100
        assert tbl.read(spark, snapshot_id=2).count() == 150
        assert tbl.read(spark).count() == 150          # current = v2

    def test_overwrite_keeps_history(self, spark, tbl):
        tbl.commit(_mk(spark, 0, 100))
        tbl.commit(_mk(spark, 0, 10), mode="overwrite")
        assert tbl.read(spark).count() == 10
        assert tbl.read(spark, snapshot_id=1).count() == 100

    def test_manifest_pruning_skips_files(self, spark, tbl):
        # 4 files with disjoint cell_id ranges -> a narrow range keeps 1
        for lo in (0, 100, 200, 300):
            df = spark.range(lo, lo + 100).select(
                F.col("id").alias("pid"), F.col("id").alias("cell_id")) \
                .coalesce(1)
            tbl.commit(df)
        df, plan = tbl.planned_scan(spark, {"cell_id": (150, 160)})
        assert plan["files_kept"] == 1 and plan["files_pruned"] == 3
        got = sorted(r.cell_id for r in df.collect())
        assert got == list(range(150, 161))   # residual filter applied

    def test_pruning_is_conservative_and_exact(self, spark, tbl):
        import random
        rnd = random.Random(7)
        rows = [(i, rnd.randrange(1000)) for i in range(500)]
        df = spark.createDataFrame(rows, "pid long, cell_id long") \
            .repartition(8)
        tbl.commit(df)
        full = {(r.pid, r.cell_id)
                for r in tbl.read(spark)
                .filter("cell_id between 200 and 400").collect()}
        pruned, plan = tbl.planned_scan(spark, {"cell_id": (200, 400)})
        assert {(r.pid, r.cell_id) for r in pruned.collect()} == full
        assert plan["files_kept"] + plan["files_pruned"] == 8

    def test_crash_before_publish_is_invisible(self, spark, tbl):
        tbl.commit(_mk(spark, 0, 50))
        # simulate a crash: data + manifest written, snap pointer never
        # created (kill between os.replace and open('x'))
        data_dir = os.path.join(tbl.path, "data", "deadbeef")
        _mk(spark, 50, 99).write.parquet(data_dir)
        json.dump({"version": 2, "base": 1, "commit_id": "deadbeef",
                   "files": [{"path": p, "rows": 0, "stats": {}} for p in
                             glob.glob(data_dir + "/*.parquet")]},
                  open(os.path.join(tbl.path, "manifest-2-deadbeef.json"),
                       "w"))
        assert tbl.current_version() == 1
        assert tbl.read(spark).count() == 50
        # next real commit supersedes the orphan manifest
        v = tbl.commit(_mk(spark, 100, 110))
        assert v == 2
        assert tbl.read(spark).count() == 60

    def test_concurrent_commit_conflict(self, spark, tbl):
        tbl.commit(_mk(spark, 0, 10))
        base = tbl.current_version()
        tbl.commit(_mk(spark, 10, 20), expected_base=base)   # winner
        with pytest.raises(CommitConflict):
            tbl.commit(_mk(spark, 20, 30), expected_base=base)  # loser
        # retry from the new base succeeds and sees the winner's rows
        tbl.commit(_mk(spark, 20, 30))
        assert tbl.read(spark).count() == 30

    def test_stats_cover_min_max(self, spark, tbl):
        tbl.commit(_mk(spark, 0, 100).coalesce(1))
        ent = tbl.manifest()["files"][0]
        assert ent["rows"] == 100
        lo, hi = ent["stats"]["cell_id"]
        assert lo == 0 and hi == 99   # id*7%100 over 0..99: id=57 -> 99

    def test_compact_preserves_rows(self, spark, tbl):
        for lo in (0, 100, 200, 300):
            tbl.commit(_mk(spark, lo, lo + 50).repartition(4))
        before = {(r.pid, r.cell_id) for r in tbl.read(spark).collect()}
        assert len(tbl.manifest()["files"]) >= 8
        v = tbl.compact(spark, target_files=2)
        assert v == 5
        assert len(tbl.manifest()["files"]) <= 2
        assert {(r.pid, r.cell_id)
                for r in tbl.read(spark).collect()} == before
        # pre-compaction snapshot still time-travels
        assert tbl.read(spark, snapshot_id=4).count() == 200

    def test_expire_snapshots(self, spark, tbl):
        tbl.commit(_mk(spark, 0, 50))
        tbl.commit(_mk(spark, 50, 80))
        tbl.compact(spark, target_files=1)
        expired = tbl.expire_snapshots(keep_last=1)
        assert expired == [1, 2]
        assert tbl.read(spark).count() == 80          # current intact
        with pytest.raises(FileNotFoundError):
            tbl.manifest(1)
        assert not glob.glob(os.path.join(tbl.path, "manifest-1-*.json"))
        # orphaned data files of expired-only snapshots are gone, but
        # files shared with the live snapshot must survive
        import glob as _glob
        import os as _os
        live = {e["path"] for e in tbl.manifest()["files"]}
        on_disk = set(_glob.glob(_os.path.join(tbl.path, "data", "*", "*.parquet")))
        assert live <= on_disk
        assert on_disk == live   # compacted table references all remaining

    def test_rename_and_drop_with_time_travel(self, spark, tbl):
        """Iceberg field-id analog: renames are metadata-only (old files
        serve the new name), drops hide the column going forward, and
        TIME TRAVEL still reads old snapshots under their own schema."""
        tbl.commit(_mk(spark, 0, 50))                           # v1
        v2 = tbl.rename_column(spark, "cell_id", "tile_id")     # v2 meta
        assert v2 == 2
        got = tbl.read(spark)
        assert got.columns == ["pid", "tile_id"]
        assert sorted((r.pid, r.tile_id) for r in got.collect()) == \
            sorted((i, i * 7 % 100) for i in range(50))
        # append under the NEW name; the OLD name is rejected
        tbl.commit(_mk(spark, 50, 60).withColumnRenamed(
            "cell_id", "tile_id"))                              # v3
        with pytest.raises(ValueError, match="drop_column"):
            tbl.commit(_mk(spark, 60, 70))    # still has cell_id → add+miss
        assert tbl.read(spark).count() == 60
        # drop pid (metadata-only), then read shows only tile_id
        tbl.drop_column(spark, "pid")                           # v4
        assert tbl.read(spark).columns == ["tile_id"]
        # time travel: v1 under its original names, v3 post-rename
        assert tbl.read(spark, snapshot_id=1).columns == ["pid", "cell_id"]
        assert tbl.read(spark, snapshot_id=3).columns == ["pid", "tile_id"]
        assert tbl.read(spark, snapshot_id=1).count() == 50

    def test_readd_after_drop_is_a_new_field(self, spark, tbl):
        """Re-adding a dropped column name allocates a FRESH field id:
        old files' bytes for the dead id never leak into the new column
        (the Iceberg field-id guarantee)."""
        tbl.commit(_mk(spark, 0, 30))                           # v1
        tbl.drop_column(spark, "cell_id")                       # v2
        tbl.commit(_mk(spark, 30, 40))                          # v3: re-add
        got = tbl.read(spark).toPandas().sort_values("pid")
        # rows from v1 files: NULL cell_id (their bytes belong to the
        # dropped id); rows from v3: real values
        old = got[got.pid < 30]
        new = got[got.pid >= 30]
        assert old["cell_id"].isna().all()
        assert (new["cell_id"] == new["pid"] * 7 % 100).all()

    def test_planned_scan_prunes_through_rename(self, spark, tbl):
        """Manifest pruning keeps working after a rename: predicates on
        the NEW name resolve to per-file stats recorded under the
        write-time physical name."""
        for lo in (0, 100, 200, 300):
            df = spark.range(lo, lo + 100).select(
                F.col("id").alias("pid"), F.col("id").alias("cell_id")) \
                .coalesce(1)
            tbl.commit(df)
        tbl.rename_column(spark, "cell_id", "tile_id")
        df, plan = tbl.planned_scan(spark, {"tile_id": (150, 160)})
        assert plan["files_kept"] == 1 and plan["files_pruned"] == 3
        got = sorted(r.tile_id for r in df.collect())
        assert got == list(range(150, 161))

    def test_evolution_survives_compaction_and_expiry(self, spark, tbl):
        tbl.commit(_mk(spark, 0, 40))
        tbl.rename_column(spark, "cell_id", "tile_id")
        tbl.commit(_mk(spark, 40, 50).withColumnRenamed(
            "cell_id", "tile_id"))
        tbl.compact(spark, target_files=1)
        tbl.expire_snapshots(keep_last=1)
        got = tbl.read(spark)
        assert got.columns == ["pid", "tile_id"]
        assert sorted((r.pid, r.tile_id) for r in got.collect()) == \
            sorted((i, i * 7 % 100) for i in range(50))

    def test_commit_tags_survive_expiry(self, spark, tbl):
        """The cumulative tag index: commit_tags() reads ONE manifest
        (not one per version), and tags of EXPIRED snapshots persist —
        a replayed pre-expiry epoch must still be deduplicated or the
        exactly-once committer would double-commit after retention."""
        for e in range(3):
            tbl.commit(_mk(spark, e * 10, e * 10 + 10), tag=f"q:{e}")
        tbl.commit(_mk(spark, 0, 5), mode="overwrite")   # untagged, carries
        assert tbl.commit_tags() == {"q:0", "q:1", "q:2"}
        tbl.expire_snapshots(keep_last=1)
        with pytest.raises(FileNotFoundError):
            tbl.manifest(1)                   # old manifests truly gone
        assert tbl.commit_tags() == {"q:0", "q:1", "q:2"}
        # the index lives IN the newest manifest — one read, no scan
        assert set(tbl.manifest()["tags"]) == {"q:0", "q:1", "q:2"}
        # replay of an expired epoch: committer sees the tag and skips
        from libgeodesk_spark.streaming.ingest import snapshot_batch_committer
        v = tbl.current_version()
        snapshot_batch_committer(tbl, "q")(_mk(spark, 0, 10), 1)
        assert tbl.current_version() == v
        assert tbl.read(spark).count() == 5

    def test_metadata_commit_preserves_legacy_tags(self, spark, tbl):
        """A rename/drop on a LEGACY table (pre-tag-index manifests)
        must fold the old per-version tags into the new manifest —
        otherwise a replayed pre-evolution epoch double-commits
        (review finding r4)."""
        tbl.commit(_mk(spark, 0, 20), tag="epoch:1")
        # strip the modern keys from the manifest on disk: simulate a
        # table written before the tag index / schema evolution existed
        man = tbl.manifest()
        mp = tbl._manifest_path(man["version"], man["commit_id"])
        for k in ("tags", "schema", "next_field_id", "file_schemas",
                  "stat_ids"):
            man.pop(k, None)
        with open(mp, "w") as f:
            json.dump(man, f)
        assert tbl.commit_tags() == {"epoch:1"}   # legacy scan path
        tbl.rename_column(spark, "cell_id", "tile_id")
        assert tbl.commit_tags() == {"epoch:1"}   # survived the rename
        assert "epoch:1" in tbl.manifest()["tags"]
        # and the replay is still deduplicated after the rename
        from libgeodesk_spark.streaming.ingest import snapshot_batch_committer
        v = tbl.current_version()
        snapshot_batch_committer(tbl, "epoch")(
            _mk(spark, 0, 20).withColumnRenamed("cell_id", "tile_id"), 1)
        assert tbl.current_version() == v

    def test_schema_evolution_add_column(self, spark, tbl):
        tbl.commit(_mk(spark, 0, 50))
        evolved = _mk(spark, 50, 80).withColumn("score", F.col("pid") * 2)
        tbl.commit(evolved)
        df = tbl.read(spark)
        assert set(df.columns) == {"pid", "cell_id", "score"}
        rows = {r.pid: r.score for r in df.collect()}
        assert rows[10] is None          # old file -> NULL for new column
        assert rows[60] == 120
        # dropping or retyping a column is rejected
        with pytest.raises(ValueError, match="missing"):
            tbl.commit(_mk(spark, 80, 90).drop("cell_id"))
        with pytest.raises(ValueError, match="retyped"):
            tbl.commit(_mk(spark, 80, 90)
                       .withColumn("score", F.lit("s")))

    def test_zorder_commit_tightens_stats(self, spark, tmp_path):
        import random
        rnd = random.Random(3)
        rows = [(i, rnd.randrange(1 << 24), rnd.randrange(1 << 24))
                for i in range(4000)]
        df = spark.createDataFrame(rows, "pid long, x long, y long") \
            .repartition(8)
        plain = SnapshotTable(str(tmp_path / "plain"), stat_cols=("x",))
        plain.commit(df)
        zed = SnapshotTable(str(tmp_path / "zed"), stat_cols=("x",))
        zed.commit(df, zorder_by=("x", "y"))
        assert zed.read(spark).count() == 4000

        def spread(t):
            ents = t.manifest()["files"]
            return sum(e["stats"]["x"][1] - e["stats"]["x"][0]
                       for e in ents) / len(ents)
        # z-ordered files carry much tighter per-file x ranges
        assert spread(zed) < spread(plain) * 0.7
        # and the pruned scan keeps fewer files for a narrow x band
        _, zp = zed.planned_scan(spark, {"x": (1000, 50000)})
        _, pp = plain.planned_scan(spark, {"x": (1000, 50000)})
        assert zp["files_pruned"] > pp["files_pruned"]

    def test_losing_writer_manifest_never_served(self, spark, tbl):
        """The CAS race fix: simulate the loser's sequence — its
        commit-unique manifest exists on disk before the CAS — and
        verify readers resolve version v through the snap pointer to
        the WINNER's manifest only."""
        tbl.commit(_mk(spark, 0, 10))     # winner publishes v1
        # loser wrote its manifest for v1 but lost the snap CAS
        json.dump({"version": 1, "base": 0, "commit_id": "loser0000000",
                   "files": [{"path": "/nonexistent", "rows": 999,
                              "stats": {}}]},
                  open(os.path.join(tbl.path,
                                    "manifest-1-loser0000000.json"), "w"))
        man = tbl.manifest(1)
        assert man["commit_id"] != "loser0000000"
        assert tbl.read(spark).count() == 10
        with pytest.raises(CommitConflict):
            tbl.commit(_mk(spark, 10, 20), expected_base=0)
        # the conflicting attempt cleaned up its own manifest
        assert len(glob.glob(os.path.join(tbl.path,
                                          "manifest-1-*.json"))) == 2


class TestStreamToSnapshot:
    def test_two_epochs_and_replay_are_exactly_once(self, spark, tbl,
                                                    tmp_path):
        """Streaming micro-batches land as atomic snapshot commits; a
        REPLAYED epoch (the foreachBatch at-least-once window: sink
        committed, checkpoint didn't record) is a no-op — the
        (query, epoch) tag in the manifest dedupes it, Iceberg
        streaming-sink style."""
        from libgeodesk_spark.streaming.ingest import (
            snapshot_batch_committer, stream_to_snapshot)
        src = str(tmp_path / "src")
        _mk(spark, 0, 60).write.parquet(src + "/b1")
        stream = spark.readStream.schema("pid long, cell_id long") \
            .parquet(src + "/*")
        q = stream_to_snapshot(stream, tbl, str(tmp_path / "ck"),
                               query_name="t")
        q.awaitTermination(300)
        v_after_1 = tbl.current_version()
        assert tbl.read(spark).count() == 60

        _mk(spark, 60, 90).write.parquet(src + "/b2")
        stream2 = spark.readStream.schema("pid long, cell_id long") \
            .parquet(src + "/*")
        q2 = stream_to_snapshot(stream2, tbl, str(tmp_path / "ck"),
                                query_name="t")
        q2.awaitTermination(300)
        assert tbl.read(spark).count() == 90
        last_epoch_version = tbl.current_version()
        assert last_epoch_version > v_after_1

        # simulate the restart replay of the LAST epoch: same data, same
        # epoch id, tag already published -> must not commit again
        commit = snapshot_batch_committer(tbl, query_name="t")
        replay_epoch = max(int(t.split(":")[1]) for t in tbl.commit_tags())
        commit(_mk(spark, 60, 90), replay_epoch)
        assert tbl.current_version() == last_epoch_version
        assert tbl.read(spark).count() == 90
        # rows exactly once, values intact
        got = sorted((r.pid, r.cell_id) for r in tbl.read(spark).collect())
        assert got == sorted((i, i * 7 % 100) for i in range(90))

    def test_committer_retries_cas_conflict(self, spark, tbl):
        """A concurrent writer stealing the version between read and
        publish surfaces as CommitConflict — the committer retries on
        the new base and lands exactly once."""
        from libgeodesk_spark.sources import catalog as cat
        from libgeodesk_spark.streaming.ingest import snapshot_batch_committer
        real_commit = cat.SnapshotTable.commit
        state = {"raced": False}

        def racing_commit(self, df, *a, **kw):
            if not state["raced"]:
                state["raced"] = True
                real_commit(self, _mk(spark, 1000, 1010), tag="rival:0")
                raise cat.CommitConflict("stolen")
            return real_commit(self, df, *a, **kw)

        cat.SnapshotTable.commit = racing_commit
        try:
            snapshot_batch_committer(tbl, "t")(_mk(spark, 0, 5), 0)
        finally:
            cat.SnapshotTable.commit = real_commit
        assert state["raced"]
        assert "t:0" in tbl.commit_tags()
        assert tbl.read(spark).count() == 15

    def test_legacy_multi_schema_upgrade_keeps_data(self, spark, tbl):
        """ADVICE r4 (high): a LEGACY table whose commits span schemas
        (old add-column history: (pid,cell_id) then (pid,cell_id,score))
        must surface every column's real values after an evolution
        commit — one shared synthesized mapping used to collapse both
        epochs into a single scan group that sampled ONE footer and
        silently NULL-filled the rest."""
        tbl.commit(_mk(spark, 0, 20))                               # v1
        tbl.commit(_mk(spark, 20, 50).withColumn(
            "score", F.col("pid") * 2))                             # v2
        # strip the modern keys on disk: simulate a pre-evolution table
        man = tbl.manifest()
        mp = tbl._manifest_path(man["version"], man["commit_id"])
        for k in ("tags", "schema", "next_field_id", "file_schemas",
                  "stat_ids"):
            man.pop(k, None)
        with open(mp, "w") as f:
            json.dump(man, f)
        tbl.rename_column(spark, "cell_id", "tile_id")              # v3
        got = tbl.read(spark).toPandas().sort_values("pid")
        assert list(got.columns) == ["pid", "tile_id", "score"]
        old, new = got[got.pid < 20], got[got.pid >= 20]
        assert old["score"].isna().all()          # files predating score
        assert (new["score"] == new["pid"] * 2).all()   # REAL values
        assert (got["tile_id"] == got["pid"] * 7 % 100).all()
        # pruning still works through the synthesized per-commit maps
        df, plan = tbl.planned_scan(spark, {"pid": (25, 30)})
        assert sorted(r.pid for r in df.collect()) == list(range(25, 31))
