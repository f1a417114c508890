"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

Headline metric = spatial-join + tiling throughput in images/sec
(BASELINE.json): points are derived at the given SF and optionally
replicated ($SPARK_GRAFT_BENCH_REPL, default 4) with distinct pids to
stress the engine beyond the raw lineitem row count.

Per-query wall-clock seconds land in "queries"; the scaling-efficiency
companion (tools/scaling_bench.py) runs this same job at local[8] vs
local[32] and writes BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def build_spark(cpus: int):
    from libgeodesk_spark.session import build_session
    return build_session("libgeodesk_spark-bench", cpus=cpus)


#: quiet-window raw-codec throughput on this box at full width (img/s),
#: pinned from the same probe run under BENCH/BASELINE.md §controls
#: conditions; a pre-run probe below PROBE_CONTENTION_BAND × this pin
#: flags the whole bench JSON as contended (host-level bandwidth
#: pressure is invisible to this VM's loadavg — r4 postmortem)
BANDWIDTH_PROBE_PIN = float(os.environ.get("SPARK_GRAFT_PROBE_PIN",
                                           "52205"))
#: quiet-window probe pins by CPU-affinity width: the probe measures the
#: bandwidth of the cores the process may USE, so a taskset-pinned
#: local[8] run must compare against the 8-core pin, not the full-width
#: one (the scaling harness pins with taskset — comparing its ~16.5k
#: 8-core probe to the 32-core pin would flag every local[8] run as
#: contended). 8-core value from the hardware-ceiling control table
#: (BENCH/BASELINE.md §controls: 15,962-16,523 img/s across rounds).
BANDWIDTH_PROBE_PINS = {
    32: BANDWIDTH_PROBE_PIN,
    8: float(os.environ.get("SPARK_GRAFT_PROBE_PIN_8", "16200")),
}
PROBE_CONTENTION_BAND = 0.80


def _probe_width() -> int:
    """CPU cores this process may actually run on (taskset-aware)."""
    try:
        return len(os.sched_getaffinity(0))
    except AttributeError:                     # non-Linux fallback
        return os.cpu_count() or 8


def _probe_codec_chunk(args):
    lo, hi = args
    from libgeodesk_spark.media import codec
    from libgeodesk_spark.sources.images import fmt_for, size_for
    for pid in range(lo, hi):
        w, h = size_for(pid)
        blob = codec.encode(codec.synth_pixels(pid, w, h), fmt_for(pid))
        px, f = codec.decode(blob)
        out = codec.encode(px, f)
        px2, _ = codec.decode(out)
        codec.psnr(px, px2)
    return hi - lo


def bandwidth_probe(n_images: int = 160_000, procs: int | None = None
                    ) -> float:
    """~5 s of the raw image codec (no Spark, multiprocessing over all
    cores) — the memory-bandwidth proxy from BENCH/BASELINE.md
    §hardware-ceiling controls, run BEFORE the timed queries. Returns
    img/s; the caller compares against BANDWIDTH_PROBE_PIN to flag
    host-level contention as recorded evidence instead of a post-hoc
    explanation (VERDICT r4 'Next round' #4)."""
    import multiprocessing as mp
    procs = procs or _probe_width()
    n_chunks = procs * 4
    chunks = [(i * n_images // n_chunks, (i + 1) * n_images // n_chunks)
              for i in range(n_chunks)]
    with mp.Pool(procs) as p:
        t0 = time.time()
        total = sum(p.map(_probe_codec_chunk, chunks))
    return total / (time.time() - t0)


def bench_points(spark, sf_dir: str, repl: int):
    """Derived points × repl (distinct pids per replica) — deterministic."""
    from pyspark.sql import functions as F

    from libgeodesk_spark.sources.points import derived_points
    base = derived_points(spark, sf_dir)
    if repl <= 1:
        return base
    # shift pid per replica; re-derive x/y by adding a small deterministic
    # jitter so replicas are not stacked on identical coordinates
    r = F.explode(F.array(*[F.lit(i) for i in range(repl)])).alias("rep")
    rep = base.select("*", r)
    return (rep
            .withColumn("x", F.col("x") + (F.col("rep") * 7919) % 65536)
            .withColumn("y", F.col("y") + (F.col("rep") * 104729) % 65536)
            .withColumn("pid", F.col("pid") * repl + F.col("rep"))
            .withColumn("image_id", F.format_string("img%012d", F.col("pid")))
            .drop("rep"))


def materialized_points(spark, sf_dir: str, repl: int):
    """Write bench points to a cell-partitioned GOL layout once (cached per
    sf/repl under /tmp) and read them back — benchmarks then measure the
    storage-scan shape of a real deployment (physical x/y columns: filter
    pushdown + partition pruning engage), not the synthetic derivation."""
    import hashlib

    from libgeodesk_spark.sources.writer import read_gol_layout, write_gol_layout
    key = hashlib.md5(f"{sf_dir}|{repl}|v2".encode()).hexdigest()[:12]
    path = f"/tmp/spark_graft_bench/{key}"
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        write_gol_layout(bench_points(spark, sf_dir, repl), path)
    return read_gol_layout(spark, path)


def run(spark, sf_dir: str, repl: int) -> dict:
    import numpy as np
    from pyspark.sql import functions as F

    from libgeodesk_spark.functions.cells import cell_id as cell_col
    from libgeodesk_spark.geom.zones import prepare_zone
    from libgeodesk_spark.operators.knn import knn
    from libgeodesk_spark.operators.spatial_join import join_zones
    from libgeodesk_spark.sources.points import GATE_ZONES

    zones = [prepare_zone(n, [np.array(r) for r in rings])
             for n, rings in GATE_ZONES.items()]

    pts = materialized_points(spark, sf_dir, repl)
    n_images = pts.count()

    timings: dict[str, float] = {}
    trials_detail: dict[str, list[float]] = {}

    n_trials = int(os.environ.get("SPARK_GRAFT_BENCH_TRIALS", "3"))

    def timed(name, fn):
        """Median-of-N (not best-of-N): the headline number must be
        reproducible by a single fresh `python bench.py`, so report the
        central tendency and keep every per-trial time in the output."""
        times = []
        out = None
        for _ in range(n_trials):
            t0 = time.time()
            out = fn()
            times.append(round(time.time() - t0, 3))
        trials_detail[name] = times
        timings[name] = sorted(times)[len(times) // 2]
        return out

    # tiling: cell assignment + multi-level pyramid rollup (pure JVM)
    def q_tiling():
        from __spark_entry__ import PYRAMID_LEVELS
        levels = F.array(*[
            F.struct(F.lit(z).alias("zoom"),
                     cell_col(F.col("x"), F.col("y"), z).alias("cell"))
            for z in PYRAMID_LEVELS])
        return (pts.select(F.explode(levels).alias("lc"))
                .groupBy("lc.zoom", "lc.cell").count().count())

    # pruned window scan over the GOL layout (partition pruning + pushdown)
    def q_window():
        from libgeodesk_spark.sources.writer import scan_window
        return scan_window(pts, 90_000_000, 642_000_000,
                           94_000_000, 646_000_000).count()

    # spatial join: all three gate zones at once (within)
    def q_join():
        return join_zones(pts, zones, predicate="within",
                          columns=["image_id"]) \
            .groupBy("zone_id").count().collect()

    def q_knn():
        from __spark_entry__ import KNN_Q
        return knn(pts, KNN_Q[0], KNN_Q[1], 50).count()

    # raster<->vector leg: synth + re-encode + PSNR per image, grouped per
    # (cell, salt) — CPU-bound (no I/O), hot cell split by the salt column
    def q_reencode():
        from libgeodesk_spark.operators.tileagg import synth_reencode_metrics
        from libgeodesk_spark.sources.points import derived_points
        return synth_reencode_metrics(derived_points(spark, sf_dir)) \
            .agg(F.sum("n_images")).collect()[0][0]

    timed("tiling_pyramid", q_tiling)
    timed("window_scan", q_window)
    join_out = timed("spatial_join_within", q_join)
    timed("knn_k50", q_knn)
    n_reencoded = timed("tile_reencode", q_reencode)

    join_rows = sum(r["count"] for r in join_out)
    total = sum(timings.values())
    join_ips = n_images / timings["spatial_join_within"]
    reencode_ips = n_reencoded / timings["tile_reencode"]
    return {
        "metric": "spatial_join_tiling_wall_seconds",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "trials": trials_detail,
        "sf": sf_dir,
        "n_images": n_images,
        "join_rows": join_rows,
        "images_per_sec_spatial_join": round(join_ips),
        "n_reencoded": n_reencoded,
        "images_per_sec_reencode": round(reencode_ips),
        "images_per_sec_total": round(n_images * len(timings) / total),
    }


def env_fingerprint(cpus: int, repl: int) -> dict:
    """Run metadata so any two bench JSONs can be compared honestly —
    the sandbox VM has high run-to-run variance (same job 5-57 s),
    so numbers without load context are not comparable."""
    import platform

    import pyspark
    with open("/proc/loadavg") as f:
        load1, load5, load15 = f.read().split()[:3]
    return {
        "cpus": cpus,
        "repl": repl,
        "trials_per_query": int(os.environ.get("SPARK_GRAFT_BENCH_TRIALS", "3")),
        "aggregation": "median",
        "loadavg_at_start": [float(load1), float(load5), float(load15)],
        "host_cpus": os.cpu_count(),
        "python": platform.python_version(),
        "pyspark": pyspark.__version__,
    }


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    repl = int(os.environ.get("SPARK_GRAFT_BENCH_REPL", "4"))
    width = _probe_width()
    pin = BANDWIDTH_PROBE_PINS.get(width)
    if os.environ.get("SPARK_GRAFT_PROBE", "1") != "0":
        probe = round(bandwidth_probe(), 1)
        # no quiet-window pin for this width -> record the probe but
        # don't guess at a verdict
        contended = (probe < PROBE_CONTENTION_BAND * pin) if pin else None
    else:
        probe, contended = None, None
    spark = build_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    fingerprint = env_fingerprint(cpus, repl)
    fingerprint["bandwidth_probe_img_per_sec"] = probe
    fingerprint["bandwidth_probe_width"] = width
    fingerprint["bandwidth_probe_pin"] = pin
    fingerprint["contention_band"] = PROBE_CONTENTION_BAND
    # warm the JVM/codegen once at tiny scale so headline numbers measure
    # the engine, not session startup
    run(spark, "/root/testdata/sf0.001", 1)
    result = run(spark, sf_dir, repl)
    result["cpus"] = cpus
    result["bandwidth_probe"] = probe
    result["contended"] = contended
    result["env"] = fingerprint
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
