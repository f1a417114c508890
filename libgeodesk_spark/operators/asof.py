"""As-of join: each left row gets the latest right row at-or-before its
timestamp, per key — the classic time-series alignment operator (DuckDB
ASOF JOIN, pandas merge_asof; the reference is spatial-only, but any
event/telemetry pipeline over the image stream needs it: "which config
/ session / calibration was in effect when this record arrived").

Spark-first shape: NOT a range join (which Catalyst would execute as a
broadcast-nested-loop or an exploding inequality join). Union both
sides, one window per key ordered by (ts, side):

    last(right_payload, ignorenulls) over rows unbounded-preceding

carries the most recent right payload forward onto every left row — ONE
shuffle on the key, pure JVM, linear in |L|+|R|, skew-bound by the
largest single key (same bound any per-key semantics implies). Right
rows sort BEFORE left rows at equal ts, giving the inclusive
``left.ts >= right.ts`` semantics DuckDB's ASOF uses.

The right payload travels as ONE struct column so all its fields come
from the SAME matched row (per-column last(ignorenulls) could otherwise
mix rows when payload fields are legitimately null).

Determinism: with multiple right rows at the same (key, ts) the match
is ambiguous in every engine; callers should dedupe the right side on
(key, ts) first (the gate data is unique by construction).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, key_cols: list[str],
              ts_col: str, payload_cols: list[str],
              prefix: str = "r_") -> DataFrame:
    """Left as-of join (backward): every left row, plus ``payload_cols``
    from the latest right row with ``right.ts <= left.ts`` and equal
    keys (NULLs when no prior right row exists)."""
    # helper names collision-proofed against caller columns: a left table
    # already carrying e.g. "_ts" must not alias into the union mechanics
    salt = "a7f3"
    while any(c.startswith(f"_{salt}") for c in set(left.columns)
              | set(right.columns)):
        salt += "x"
    TS, SIDE, PAY, MATCH = (f"_{salt}_ts", f"_{salt}_side",
                            f"_{salt}_pay", f"_{salt}_match")
    payload = F.struct(*[F.col(c) for c in payload_cols]).alias(PAY)
    r = right.select(*key_cols, F.col(ts_col).alias(TS),
                     F.lit(0).alias(SIDE), payload)
    lcols = left.columns
    l = left.select(*lcols, F.col(ts_col).alias(TS),
                    F.lit(1).alias(SIDE),
                    F.lit(None).cast(r.schema[PAY].dataType).alias(PAY))
    # align: right rows need the left columns (nulled) for the union —
    # ONE select (a per-column withColumn loop costs analyzer time
    # linearly in the left width)
    ltypes = {f.name: f.dataType for f in left.schema.fields}
    r = r.select(*[F.col(c) if c in r.columns
                   else F.lit(None).cast(ltypes[c]).alias(c)
                   for c in lcols], TS, SIDE, PAY)
    u = l.select(*lcols, TS, SIDE, PAY).unionByName(r)
    w = (Window.partitionBy(*key_cols).orderBy(TS, SIDE)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    carried = F.last(PAY, ignorenulls=True).over(w).alias(MATCH)
    out = u.select(*lcols, SIDE, carried).filter(F.col(SIDE) == 1)
    return out.select(
        *lcols, *[F.col(MATCH)[c].alias(prefix + c) for c in payload_cols])
