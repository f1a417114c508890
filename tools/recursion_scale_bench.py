"""Recursive-closure scale evidence: members_recursive over the sf0.1
nested membership (chains of 8 relations + a 2-cycle at every chain
head) from EVERY chain-head root at once — the iterative-join cost
profile (rounds × shuffles) a superrelation walk pays. Writes
BENCH/RECURSION.md.

Usage: python tools/recursion_scale_bench.py [sf_dir]
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

    from __spark_entry__ import _memb_nested
    from libgeodesk_spark.operators.topology import members_recursive
    from libgeodesk_spark.session import build_session

    spark = build_session("recursion-scale", cpus=int(
        os.environ.get("SPARK_GRAFT_CPUS", "32")))
    memb = _memb_nested(spark, sf_dir).persist()
    n_memb = memb.count()
    # every chain head (rank % 8 == 0; the 2-cycle back edge makes heads
    # members too, so "never a member" finds nothing — use the rank)
    from pyspark.sql import Window
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    ranks = (li.select(F.col("l_orderkey").alias("k")).distinct()
             .select("k", (F.row_number().over(Window.orderBy("k")) - 1)
                     .alias("i")))
    roots = [r["k"] for r in ranks.filter(F.col("i") % 8 == 0).collect()]
    t0 = time.time()
    out = members_recursive(memb, roots)
    rows = out.count()
    depth_hist = {int(r["depth"]): int(r["n"]) for r in
                  out.groupBy("depth").agg(F.count("*").alias("n"))
                  .orderBy("depth").collect()}
    wall = round(time.time() - t0, 2)
    stats = {"sf": sf_dir, "membership_rows": n_memb,
             "roots": len(roots), "closure_rows": rows,
             "max_depth": max(depth_hist), "depth_hist": depth_hist,
             "wall_sec": wall,
             "closure_rows_per_sec": round(rows / wall)}
    md = [
        "# Recursive closure — scale evidence",
        "",
        (f"`members_recursive` over the `{sf_dir}` nested membership "
         f"({n_memb:,} rows; relation chains of 8 with a 2-cycle at "
         f"every head) from ALL {len(roots):,} chain-head roots at "
         f"once: {rows:,} closure rows in {wall} s on local[32] "
         f"({stats['closure_rows_per_sec']:,} rows/s), max depth "
         f"{stats['max_depth']}."),
        "",
        ("Cost shape: one equi-join + one seen-set anti-join + one "
         "localCheckpoint per BFS round — rounds = max member depth "
         "(bounded, real OSM forests are ≤10), NOT corpus size; every "
         "frontier shrinks to the relation-typed fan-out. The 2-cycles "
         "at every head terminate via the (root, member) anti-join — "
         "the distributed RecursionGuard."),
        "",
        f"Depth histogram: `{json.dumps(depth_hist)}`",
        "",
        f"Raw: `{json.dumps(stats)}`",
    ]
    with open(os.path.join(REPO, "BENCH", "RECURSION.md"), "w") as f:
        f.write("\n".join(md) + "\n")
    print(json.dumps(stats))
    spark.stop()


if __name__ == "__main__":
    main()
