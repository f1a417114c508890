"""As-of join vs DuckDB's native ASOF JOIN (operators/asof.py)."""

import duckdb
import pandas as pd
import pytest


class TestAsofJoin:
    def test_basic_semantics(self, spark):
        from libgeodesk_spark.operators.asof import asof_join
        left = spark.createDataFrame(
            [(1, 5, "a"), (1, 9, "b"), (2, 4, "c"), (3, 8, "d")],
            "k long, ts long, name string")
        right = spark.createDataFrame(
            [(1, 3, 30), (1, 7, 70), (1, 9, 90), (2, 6, 60)],
            "k long, ts long, rv long")
        got = {(r.k, r.ts): r.r_rv for r in
               asof_join(left, right, ["k"], "ts", ["rv"]).collect()}
        assert got == {(1, 5): 30,    # latest right at-or-before 5
                       (1, 9): 90,    # equal ts is inclusive
                       (2, 4): None,  # right exists but only later
                       (3, 8): None}  # no right rows for the key

    def test_matches_duckdb_asof_on_events(self, spark, sf_dir):
        """purchases as-of their user's latest prior view — engine vs
        DuckDB's native ASOF LEFT JOIN, exact row multiset."""
        from libgeodesk_spark.operators.asof import asof_join
        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        left = ev.filter("event_type = 'purchase'") \
            .select("event_id", "user_id", "ts")
        right = ev.filter("event_type = 'view'") \
            .select("user_id", "ts", "event_id")
        got = asof_join(left, right, ["user_id"], "ts", ["event_id"]) \
            .select("event_id", "user_id", "r_event_id").toPandas()
        con = duckdb.connect()
        con.execute(f"CREATE VIEW events AS SELECT * FROM "
                    f"'{sf_dir}/events.parquet'")
        want = con.execute("""
            WITH l AS (SELECT event_id, user_id, ts FROM events
                       WHERE event_type = 'purchase'),
                 r AS (SELECT event_id, user_id, ts FROM events
                       WHERE event_type = 'view')
            SELECT l.event_id, l.user_id, r.event_id AS r_event_id
            FROM l ASOF LEFT JOIN r
              ON l.user_id = r.user_id AND l.ts >= r.ts
        """).df()

        def norm(df):
            return sorted(
                (int(a), int(b), None if pd.isna(c) else int(c))
                for a, b, c in df[["event_id", "user_id",
                                   "r_event_id"]].itertuples(index=False))
        assert norm(got) == norm(want)
        assert len(got) > 0

    def test_multi_payload_row_consistency(self, spark):
        """All payload fields must come from the SAME matched right row,
        even when some fields are null there."""
        from libgeodesk_spark.operators.asof import asof_join
        left = spark.createDataFrame([(1, 10)], "k long, ts long")
        right = spark.createDataFrame(
            [(1, 3, 33, "x"), (1, 7, None, "y")],
            "k long, ts long, a int, b string")
        row = asof_join(left, right, ["k"], "ts", ["a", "b"]).collect()[0]
        assert row.r_b == "y" and row.r_a is None   # both from ts=7


def test_asof_random_model(spark):
    """Seeded random timelines (duplicate left ts, keys with empty right
    side, interleaved epochs) vs an independent Python model: each left
    row carries the payload of the LATEST right row with right.ts <=
    left.ts for its key, NULL when none precedes."""
    import random

    from libgeodesk_spark.operators.asof import asof_join
    rng = random.Random(99)
    lrows, rrows = [], []
    for i in range(400):
        k = rng.randrange(8)
        lrows.append((i, k, rng.randrange(50)))
    for j in range(300):
        k = rng.randrange(6)          # keys 6,7 never get right rows
        rrows.append((1000 + j, k, rng.randrange(50)))
    # dedupe right on (key, ts): multiple right rows at the same (k, ts)
    # are ambiguous in every engine (documented contract)
    seen = set()
    rdedup = []
    for rid, k, ts in rrows:
        if (k, ts) not in seen:
            seen.add((k, ts))
            rdedup.append((rid, k, ts))
    left = spark.createDataFrame(lrows, "lid long, k long, ts long")
    right = spark.createDataFrame(rdedup, "rid long, k long, ts long")
    got = {r["lid"]: r["r_rid"] for r in
           asof_join(left, right, ["k"], "ts", ["rid"]).collect()}
    assert len(got) == len(lrows)
    best = {}
    for rid, k, ts in rdedup:
        cur = best.get(k, [])
        cur.append((ts, rid))
        best[k] = cur
    for lid, k, ts in lrows:
        cands = [(rts, rid) for rts, rid in best.get(k, []) if rts <= ts]
        want = max(cands)[1] if cands else None
        assert got[lid] == want, (lid, k, ts)
