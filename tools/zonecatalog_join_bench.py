"""Zone-CATALOG join: 1.83M points × 1,000 zones end-to-end — the scale
axis the headline bench doesn't exercise (its gate set is 3 zones).

Pipeline measured: WKB catalog → distributed prep (operators/zoneprep)
→ driver assembly → multi-zone broadcast interval join (join_zones
groups zones by fitted cover zoom; per-group BroadcastHashJoin with the
run-length interval build side). Asserts the plan stays
broadcast-shaped. Appends results to BENCH/ZONEPREP.md.

Usage: python tools/zonecatalog_join_bench.py [n_zones]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    import numpy as np
    from pyspark.sql import functions as F

    from bench import build_spark, materialized_points
    from libgeodesk_spark.geom.wkb import rings_to_wkb
    from libgeodesk_spark.operators.spatial_join import join_zones
    from libgeodesk_spark.operators.zoneprep import (
        prepare_zones, prepared_zones_df)

    n_zones = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    spark = build_spark(int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")

    pts = materialized_points(spark, "/root/testdata/sf0.1", 4)
    n_pts = pts.count()

    # catalog: parish-to-city zones scattered over the points' world
    # window (so a realistic fraction of points actually match) plus the
    # rest of the globe (so most zones see few points — catalog skew)
    rng = np.random.default_rng(7)
    rows = []
    for i in range(n_zones):
        if i % 4 == 0:      # in-window zones: overlap the data
            cx = int(rng.integers(88_000_000, 96_000_000))
            cy = int(rng.integers(640_000_000, 648_000_000))
        else:               # rest-of-world zones
            cx = int(rng.integers(-1_500_000_000, 1_500_000_000))
            cy = int(rng.integers(-1_000_000_000, 1_000_000_000))
        r = int(rng.integers(50_000, 500_000))
        k = int(rng.integers(5, 17))
        ang = np.sort(rng.uniform(0, 2 * np.pi, k))
        rad = r * rng.uniform(0.6, 1.0, k)
        ring = np.stack([cx + (rad * np.cos(ang)).astype(np.int64),
                         cy + (rad * np.sin(ang)).astype(np.int64)], axis=1)
        ring = np.vstack([ring, ring[:1]])
        rows.append((f"z{i:04d}", bytearray(rings_to_wkb([ring], merc=True))))
    wkb = spark.createDataFrame(rows, "zone_id string, wkb binary").persist()
    wkb.count()

    from libgeodesk_spark.operators.zoneprep import (
        collect_prepared, collect_prepared_light, prepared_zones_df)
    t0 = time.time()
    prepped = prepared_zones_df(wkb, n_slices=128).persist()
    prepped.count()
    exec_sec = round(time.time() - t0, 2)
    # FULL driver assembly (cover dicts) vs LIGHT (edges + intervals):
    # the serial step a 10^4-zone catalog actually feels
    t0 = time.time()
    zones_full = collect_prepared(prepped)
    full_collect_sec = round(time.time() - t0, 2)
    t0 = time.time()
    zones, intervals = collect_prepared_light(prepped)
    light_collect_sec = round(time.time() - t0, 2)
    prep_sec = exec_sec + light_collect_sec
    total_edges = sum(len(z.edges) for z in zones)
    total_cover = sum(len(z.cover) for z in zones_full)
    zooms = sorted({z.zoom for z in zones})
    print(f"prep: exec {exec_sec}s + light collect {light_collect_sec}s "
          f"(full-dict collect would be {full_collect_sec}s) — "
          f"{len(zones)} zones, {total_edges} edges, {total_cover} cover "
          f"cells → {len(intervals)} intervals, zoom groups {zooms}",
          flush=True)
    del zones_full

    t0 = time.time()
    out = join_zones(pts, zones, predicate="within", columns=["image_id"],
                     intervals=intervals)
    memberships = out.count()
    join_sec = round(time.time() - t0, 2)
    print(f"join: {join_sec}s — {memberships} memberships "
          f"({round(n_pts / join_sec):,} img/s)", flush=True)

    plan = join_zones(pts, zones, predicate="within",
                      columns=["image_id"], intervals=intervals) \
        ._jdf.queryExecution().executedPlan().toString()
    forbidden = [t for t in ("SortMergeJoin", "CartesianProduct",
                             "BatchEvalPython") if t in plan]
    assert "BroadcastHashJoin" in plan and not forbidden, \
        (forbidden, "BroadcastHashJoin" in plan)
    print("plan: BroadcastHashJoin, no SortMergeJoin/Cartesian/row-Python",
          flush=True)

    # correctness spot-check: exact numpy PIP for 3 zones (incl. one
    # in-window) over ALL points vs the join's per-zone counts
    from libgeodesk_spark.geom import kernel
    per_zone = {r["zone_id"]: r["n"] for r in
                out.groupBy("zone_id").agg(F.count("*").alias("n"))
                .collect()}
    xy = pts.select("x", "y").toPandas()
    px = xy["x"].to_numpy(np.int64)
    py = xy["y"].to_numpy(np.int64)
    checked = {}
    zmap = {z.zone_id: z for z in zones}       # collect order is arbitrary
    for z in (zmap["z0000"], zmap["z0004"], zmap["z0008"]):   # in-window
        loc = kernel.locate_points(px, py, z.edges)
        want = int((loc == kernel.INSIDE).sum())
        got = per_zone.get(z.zone_id, 0)
        assert got == want, (z.zone_id, got, want)
        checked[z.zone_id] = want
    print(f"spot-check exact vs numpy brute: {checked} OK", flush=True)

    raw = {"n_zones": len(zones), "n_points": n_pts,
           "spot_check": checked,
           "total_edges": total_edges, "total_cover_cells": total_cover,
           "n_intervals": len(intervals), "zoom_groups": zooms,
           "prep_exec_sec": exec_sec,
           "collect_light_sec": light_collect_sec,
           "collect_full_dicts_sec": full_collect_sec,
           "join_sec": join_sec, "memberships": memberships,
           "img_per_sec": round(n_pts / join_sec)}
    md = f"""

## {len(zones):,}-zone catalog JOIN (end-to-end)

{n_pts:,} points × {len(zones)} zones (¼ overlap the data window —
catalog skew: most zones see few points): executor prep {exec_sec} s +
LIGHT driver assembly {light_collect_sec} s (edges + pre-computed
intervals only; materializing the full cover dicts would cost
{full_collect_sec} s — the serial step the light path removes), then
the multi-zone broadcast interval join in **{join_sec} s**
({round(n_pts / join_sec):,} img/s, {memberships:,} memberships).
{total_edges:,} edges / {total_cover:,} exact cover cells across
{len(zooms)} fitted-zoom groups; plan is BroadcastHashJoin per zoom
group — no SortMergeJoin, no cartesian, no row-Python. The probe side
is scanned once per zoom group and never shuffled; at 1000× the points
this stays a map-side join against the same broadcast.

Raw: `{json.dumps(raw)}`
"""
    with open(os.path.join(REPO, "BENCH", "ZONEPREP.md"), "a") as f:
        f.write(md)
    print(md)


if __name__ == "__main__":
    main()
