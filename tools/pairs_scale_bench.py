"""Scale evidence for the pair-producing joins: within_distance_pairs
(grid band join) and asof_join (windowed union) at sf0.1. Writes
BENCH/PAIRS.md.

Usage: python tools/pairs_scale_bench.py [sf_dir]
"""
from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from pyspark.sql import functions as F

    from libgeodesk_spark.operators.asof import asof_join
    from libgeodesk_spark.operators.distance import within_distance_pairs
    from libgeodesk_spark.session import build_session
    from libgeodesk_spark.sources.points import derived_points

    spark = build_session("pairs-scale", cpus=int(
        os.environ.get("SPARK_GRAFT_CPUS", "32")))
    pts = derived_points(spark, sf_dir).select("pid", "x", "y")
    pts.persist().count()
    n = pts.count()
    out = {"sf": sf_dir, "n_points": n}

    t0 = time.time()
    pairs = within_distance_pairs(pts, 32, id_col="pid").count()
    out["near_pairs_r32"] = {"pairs": pairs,
                             "wall_sec": round(time.time() - t0, 2)}

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    left = ev.filter("event_type = 'purchase'") \
        .select("event_id", "user_id", "ts")
    right = ev.filter("event_type = 'view'") \
        .select("user_id", "ts", "event_id")
    t0 = time.time()
    rows = asof_join(left, right, ["user_id"], "ts", ["event_id"]).count()
    out["asof"] = {"rows": rows, "wall_sec": round(time.time() - t0, 2)}

    md = [
        "# Pair joins — scale evidence (sf0.1, local[32])",
        "",
        f"- `within_distance_pairs(r=32)` over {n:,} points "
        f"(20% in one dense block): {out['near_pairs_r32']['pairs']:,} "
        f"exact pairs in {out['near_pairs_r32']['wall_sec']} s. Output "
        "is dominated by the dense block — the genuinely quadratic "
        "region — and the grid bounds candidates at 9x the output.",
        f"- `asof_join` purchases x prior views: "
        f"{out['asof']['rows']:,} rows in {out['asof']['wall_sec']} s "
        "(one window shuffle; linear in |L|+|R|).",
        "",
        f"Raw: `{json.dumps(out)}`",
    ]
    with open(os.path.join(REPO, "BENCH", "PAIRS.md"), "w") as f:
        f.write("\n".join(md) + "\n")
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
