"""ANN scale evidence: LSH bucket / IVF list size distributions + recall
at a replicated embedding corpus, written to BENCH/ANN.md.

Complements the gate's ann_recall (sf0.01): here the corpus is replicated
with deterministic jitter so bucket-count auto-scaling (auto_planes) and
IVF k-means actually face a bigger N, and we verify (a) bucket sizes stay
near LSH_TARGET_BUCKET, (b) IVF lists stay balanced, (c) recall@k holds.

Usage: python tools/ann_scale_bench.py [sf_dir] [repl]
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
    repl = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    from pyspark.sql import functions as F

    from libgeodesk_spark.operators import ann
    from libgeodesk_spark.session import build_session

    spark = build_session("ann-scale", cpus=int(
        os.environ.get("SPARK_GRAFT_CPUS", "32")))
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n0 = emb.count()
    # deterministic jittered replication: replica i shifts each component
    # by a tiny id-dependent offset, so replicas are near-neighbors (the
    # hard case: ANN must separate them into consistent buckets), not
    # byte-identical rows
    r = F.explode(F.array(*[F.lit(i) for i in range(repl)])).alias("rep")
    big = (emb.select("*", r)
           .withColumn("vec_id", F.col("vec_id") * repl + F.col("rep"))
           .withColumn(
               "embedding",
               F.transform("embedding",
                           lambda v, i: v + (F.col("rep") * (i + 1) % 7)
                           .cast("float") / 1000.0))
           .drop("rep"))
    n = big.count()
    out = {"sf": sf_dir, "repl": repl, "vectors": n, "base": n0}

    # --- LSH bucket distribution at auto-scaled plane count ---
    planes = ann.auto_planes(n)
    sig = big.select(ann.lsh_signature(F.col("embedding"), 64, planes)
                     .alias("bucket"))
    row = sig.groupBy("bucket").count().agg(
        F.count("*").alias("n_buckets"), F.max("count").alias("max"),
        F.expr("percentile_approx(count, 0.99)").alias("p99"),
        F.avg("count").alias("mean")).collect()[0]
    out["lsh"] = {"planes": planes, "target": ann.LSH_TARGET_BUCKET,
                  **{k: float(row[k]) for k in ("n_buckets", "max",
                                                "p99", "mean")}}

    # --- IVF list balance with trained centroids ---
    t0 = time.time()
    cents = ann.ivf_centroids(big)
    out["ivf_train_sec"] = round(time.time() - t0, 2)
    assigned = ann.ivf_assign(big, cents)
    row = assigned.groupBy("list_id").count().agg(
        F.count("*").alias("n_lists"), F.max("count").alias("max"),
        F.min("count").alias("min"), F.avg("count").alias("mean")).collect()[0]
    out["ivf"] = {k: float(row[k]) for k in ("n_lists", "max", "min", "mean")}

    # --- distributed trainer at corpus-scaled list count ---
    t0 = time.time()
    n_lists = ann.auto_lists(n)
    dcents = ann.ivf_centroids_distributed(big, n_lists, iters=5)
    out["ivf_dist_train_sec"] = round(time.time() - t0, 2)
    row = ann.ivf_assign(big, dcents).groupBy("list_id").count().agg(
        F.count("*").alias("n_lists"), F.max("count").alias("max"),
        F.min("count").alias("min"), F.avg("count").alias("mean")).collect()[0]
    out["ivf_dist"] = {k: float(row[k]) for k in ("n_lists", "max",
                                                  "min", "mean")}
    out["ivf_dist"]["trained_lists"] = n_lists

    # --- recall@10 on the replicated corpus ---
    qids = [int(big.agg(F.min("vec_id")).first()[0]) + i * 97
            for i in range(8)]
    t0 = time.time()
    rec = {r["method"]: int(r["recall_pct"])
           for r in ann.ann_recall(big, qids, 10).collect()}
    out["recall_pct"] = rec
    out["recall_sec"] = round(time.time() - t0, 2)

    # dist-trained IVF recall (nprobe scaled to ~1/8 of the lists)
    t0 = time.time()
    exact = {(r["qid"], r["vec_id"])
             for r in ann.brute_topk(big, qids, 10).collect()}
    nprobe = max(8, n_lists // 8)
    got = {(r["qid"], r["vec_id"])
           for r in ann.ivf_topk(big, qids, 10, nprobe=nprobe,
                                 centroids=dcents).collect()}
    rec["ivf_dist"] = int(round(100.0 * len(got & exact)
                                / max(len(exact), 1)))
    out["ivf_dist"]["nprobe"] = nprobe
    out["ivf_dist_recall_sec"] = round(time.time() - t0, 2)

    # PQ8x8 + exact re-rank (the memory-scale path: 32x less scan IO)
    t0 = time.time()
    books = ann.pq_train(big, iters=3)
    codes = ann.pq_encode(big, books)
    got = {(r["qid"], r["vec_id"]) for r in
           ann.pq_topk_rerank(big, codes, books, qids, 10,
                              shortlist=128).collect()}
    rec["pq_rerank"] = int(round(100.0 * len(got & exact)
                                 / max(len(exact), 1)))
    out["pq"] = {"m": int(books.shape[0]), "ksub": int(books.shape[1]),
                 "shortlist": 128,
                 "sec": round(time.time() - t0, 2)}

    # --- HIGH-DIM evidence (production embedding shapes) -------------------
    # (a) dim-256 corpus, planes auto-scaled: planes*dim > LSH_JVM_MAX_TERMS
    # so signatures run the Arrow matmul path end-to-end; recall must hold.
    hd_n, hd_dim = 24576, 256
    hd = ann.synth_embeddings(spark, hd_n, hd_dim, n_clusters=192,
                              jitter=0.30).cache()
    hd.count()
    hd_planes = ann.auto_planes(hd_n)
    assert hd_planes * hd_dim > ann.LSH_JVM_MAX_TERMS  # Arrow path engaged
    t0 = time.time()
    b0 = ann.lsh_biases(hd, hd_dim, hd_planes)
    sig = ann.lsh_tagged(hd, hd_dim, hd_planes, b0).groupBy("bucket").count()
    row = sig.agg(
        F.count("*").alias("n_buckets"), F.max("count").alias("max"),
        F.expr("percentile_approx(count, 0.99)").alias("p99"),
        F.avg("count").alias("mean")).collect()[0]
    hd_qids = [i * 997 for i in range(8)]
    rec_hd = {r["method"]: int(r["recall_pct"]) for r in
              ann.ann_recall(hd, hd_qids, 10, dim=hd_dim).collect()}
    out["highdim"] = {
        "n": hd_n, "dim": hd_dim, "planes": hd_planes,
        "jvm_max_terms": ann.LSH_JVM_MAX_TERMS,
        "lsh_buckets": {k: float(row[k]) for k in ("n_buckets", "max",
                                                   "p99", "mean")},
        "recall_pct": rec_hd, "sec": round(time.time() - t0, 2)}
    hd.unpersist()

    # (b) trainer stress at the documented target SHAPE: dim 768,
    # n_lists 4096 — per-iteration driver transfer is exactly n_lists
    # rows (one (list_id, cnt, sums[768]) row per list), vs the ~3.1M
    # (list, dim) rows/iter of the old per-dimension explode.
    tr_n, tr_dim, tr_lists = 16384, 768, 4096
    tr = ann.synth_embeddings(spark, tr_n, tr_dim, n_clusters=256,
                              jitter=0.2).cache()
    tr.count()
    t0 = time.time()
    tcents = ann.ivf_centroids_distributed(tr, tr_lists, iters=3)
    tr_sec = round(time.time() - t0, 2)
    arow = ann.ivf_assign(tr, tcents).groupBy("list_id").count().agg(
        F.count("*").alias("n_lists"), F.max("count").alias("max"),
        F.avg("count").alias("mean")).collect()[0]
    out["trainer_768d"] = {
        "n": tr_n, "dim": tr_dim, "n_lists": tr_lists,
        "iters": 3, "sec": tr_sec,
        "driver_rows_per_iter": tr_lists,
        "assigned": {k: float(arow[k]) for k in ("n_lists", "max", "mean")}}
    tr.unpersist()

    md = [
        "# ANN — scale evidence",
        "",
        f"Corpus: `{sf_dir}` embeddings × {repl} jittered replicas = "
        f"{n:,} vectors (replicas are near-neighbors — the hard bucketing "
        "case).",
        "",
        "| path | structure | max | p99/min | mean | note |",
        "|---|---|---|---|---|---|",
        (f"| LSH ({out['lsh']['planes']} planes, auto-scaled) "
         f"| {out['lsh']['n_buckets']:,.0f} buckets "
         f"| {out['lsh']['max']:,.0f} | p99 {out['lsh']['p99']:,.0f} "
         f"| {out['lsh']['mean']:.0f} "
         f"| target ~{out['lsh']['target']}/bucket |"),
        (f"| IVF ({out['ivf']['n_lists']:.0f} k-means lists) "
         f"| {out['ivf']['n_lists']:.0f} lists | {out['ivf']['max']:,.0f} "
         f"| min {out['ivf']['min']:,.0f} | {out['ivf']['mean']:,.0f} "
         f"| trained in {out['ivf_train_sec']} s |"),
        (f"| IVF-dist ({out['ivf_dist']['trained_lists']} auto_lists, "
         f"distributed Lloyd) "
         f"| {out['ivf_dist']['n_lists']:.0f} lists "
         f"| {out['ivf_dist']['max']:,.0f} "
         f"| min {out['ivf_dist']['min']:,.0f} "
         f"| {out['ivf_dist']['mean']:,.0f} "
         f"| trained in {out['ivf_dist_train_sec']} s |"),
        "",
        f"Recall@10 vs exact brute force over 8 probe queries: "
        f"LSH {rec.get('lsh')}%, IVF {rec.get('ivf')}% "
        f"({out['recall_sec']} s); distributed-trained IVF "
        f"(nprobe {out['ivf_dist']['nprobe']}) {rec.get('ivf_dist')}% "
        f"({out['ivf_dist_recall_sec']} s); PQ8x8 ADC shortlist-128 + "
        f"exact re-rank {rec.get('pq_rerank')}% ({out['pq']['sec']} s — "
        "8-byte codes, 32x less scan IO than full vectors).",
        "",
        "",
        "## High-dim (production embedding shapes)",
        "",
        (f"dim-{hd_dim} corpus ({hd_n:,} vectors, {hd_planes} planes — "
         f"{hd_planes * hd_dim:,} terms > LSH_JVM_MAX_TERMS="
         f"{ann.LSH_JVM_MAX_TERMS}, so signatures run the ONE-ARROW-PASS "
         "numpy matmul; the unrolled JVM expression at this shape blows "
         "janino's 64 KB method limit — measured): "
         f"{out['highdim']['lsh_buckets']['n_buckets']:,.0f} buckets, "
         f"mean {out['highdim']['lsh_buckets']['mean']:.0f}, "
         f"p99 {out['highdim']['lsh_buckets']['p99']:,.0f}; recall@10 "
         f"LSH {rec_hd.get('lsh')}% / IVF {rec_hd.get('ivf')}% "
         f"({out['highdim']['sec']} s)."),
        "",
        (f"Distributed Lloyd at the documented TARGET SHAPE — dim "
         f"{tr_dim}, n_lists {tr_lists:,} ({tr_n:,} vectors, 3 iters): "
         f"{out['trainer_768d']['sec']} s, driver transfer = "
         f"{tr_lists:,} rows/iter (one (list, cnt, sums[{tr_dim}]) row "
         "per list via the JVM zip_with array reduce; the per-dimension "
         f"explode this replaced shipped ~{tr_lists * tr_dim / 1e6:.1f}M "
         "rows/iter). Assigned lists: "
         f"{out['trainer_768d']['assigned']['n_lists']:,.0f} non-empty, "
         f"max {out['trainer_768d']['assigned']['max']:,.0f}, mean "
         f"{out['trainer_768d']['assigned']['mean']:.1f}."),
        "",
        f"Raw: `{json.dumps(out)}`",
    ]
    path = os.path.join(REPO, "BENCH", "ANN.md")
    with open(path, "w") as f:
        f.write("\n".join(md) + "\n")
    print(json.dumps(out))
    print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
