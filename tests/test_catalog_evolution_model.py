"""Randomized (seeded) model check of SnapshotTable schema evolution:
a sequence of commit / rename / drop / append-with-add / compact /
expire operations against an independent Python FIELD-ID model. After
every op the table's read() must equal the model (schema names AND
values resolved by field id), and time travel must replay any retained
snapshot under that snapshot's own schema.

This is the evolution analog of the GOQL property suite: the fixed
gate query pins one rename+drop sequence; this pins the COMPOSITION
space (rename-then-re-add, drop-then-rename, evolution across
compaction, expiry of pre-evolution snapshots...)."""

import random

import pytest
from pyspark.sql import functions as F

from libgeodesk_spark.sources.catalog import SnapshotTable


class Model:
    """Field-id table model: columns are (fid, name, default-null);
    rows store values BY FID, so renames are free and re-added names
    get fresh fids exactly like the implementation claims."""

    def __init__(self):
        self.schema = []          # list of (fid, name)
        self.next_fid = 1
        self.rows = []            # list of {fid: value}
        self.history = {}         # version -> (schema, rows) snapshots
        self.version = 0

    def snap(self):
        self.version += 1
        self.history[self.version] = ([tuple(c) for c in self.schema],
                                      [dict(r) for r in self.rows])

    def commit(self, batch_cols, batch_rows, overwrite=False):
        names = {n for _, n in self.schema}
        for n in batch_cols:
            if n not in names:
                self.schema.append((self.next_fid, n))
                self.next_fid += 1
        by_name = {n: f for f, n in self.schema}
        new = [{by_name[c]: row[i] for i, c in enumerate(batch_cols)}
               for row in batch_rows]
        self.rows = new if overwrite else self.rows + new
        self.snap()

    def rename(self, old, new):
        self.schema = [(f, new if n == old else n) for f, n in self.schema]
        self.snap()

    def drop(self, name):
        self.schema = [(f, n) for f, n in self.schema if n != name]
        self.snap()

    def expected(self, version=None):
        schema, rows = (self.history[version] if version
                        else (self.schema, self.rows))
        names = [n for _, n in schema]
        out = [tuple(r.get(f) for f, _ in schema) for r in rows]
        return names, sorted(out, key=lambda t: tuple(
            (v is None, v) for v in t))


def _read_sorted(tbl, spark, version=None):
    df = tbl.read(spark, snapshot_id=version)
    names = df.columns
    rows = [tuple(r[c] for c in names) for r in df.collect()]
    return names, sorted(rows, key=lambda t: tuple(
        (v is None, v) for v in t))


COL_POOL = ["alpha", "beta", "gamma", "delta", "eps"]


@pytest.mark.parametrize("seed", [11, 23, 47])
def test_random_evolution_sequences_match_model(spark, tmp_path, seed):
    rng = random.Random(seed)
    tbl = SnapshotTable(str(tmp_path / f"t{seed}"), stat_cols=("pid",))
    model = Model()
    next_pid = 0

    def batch(cols, n):
        nonlocal next_pid
        rows = []
        for _ in range(n):
            rows.append([next_pid] + [
                rng.randrange(1000) for _ in cols[1:]])
            next_pid += 1
        return rows

    # first commit always
    cols = ["pid", "alpha", "beta"]
    rows = batch(cols, rng.randrange(3, 8))
    tbl.commit(spark.createDataFrame(rows, " , ".join(
        f"{c} long" for c in cols).replace(" , ", ", ")))
    model.commit(cols, rows)

    for _ in range(12):
        live = [n for n in
                [c["name"] for c in tbl.manifest()["schema"]]]
        op = rng.choice(["append", "append_add", "rename", "drop",
                         "compact", "expire", "timetravel"])
        if op in ("append", "append_add"):
            cols = list(live)
            if op == "append_add":
                fresh = [c for c in COL_POOL if c not in live]
                if fresh:
                    cols.append(rng.choice(fresh))
            rows = batch(cols, rng.randrange(2, 6))
            df = spark.createDataFrame(rows, ", ".join(
                f"{c} long" for c in cols))
            tbl.commit(df.select(*cols))
            model.commit(cols, rows)
        elif op == "rename":
            renamable = [n for n in live if n != "pid"]
            fresh = [c for c in COL_POOL if c not in live]
            if not renamable or not fresh:
                continue
            old, new = rng.choice(renamable), rng.choice(fresh)
            tbl.rename_column(spark, old, new)
            model.rename(old, new)
        elif op == "drop":
            droppable = [n for n in live if n != "pid"]
            if len(droppable) < 1 or len(live) < 3:
                continue
            name = rng.choice(droppable)
            tbl.drop_column(spark, name)
            model.drop(name)
        elif op == "compact":
            tbl.compact(spark, target_files=2)
            # row-preserving overwrite: model state unchanged, version++
            model.snap()
        elif op == "expire":
            tbl.expire_snapshots(keep_last=2)
            keep = sorted(model.history)[-2:]
            model.history = {v: s for v, s in model.history.items()
                             if v in keep}
            continue           # no new version; verify below still runs
        else:
            retained = sorted(model.history)
            v = rng.choice(retained)
            want = model.expected(v)
            got = _read_sorted(tbl, spark, v)
            assert got == want, (op, v, got[0], want[0])
            continue

        want = model.expected()
        got = _read_sorted(tbl, spark)
        assert got == want, (op, got[0], want[0])

    # final: every retained snapshot replays under its own schema
    for v in sorted(model.history):
        assert _read_sorted(tbl, spark, v) == model.expected(v), v
