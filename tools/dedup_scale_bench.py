"""Dedup scale evidence: band-bucket size distributions + runtimes for the
simhash and MinHash-LSH paths on a replicated near-dup-heavy corpus.

Why this exists (VERDICT r1, item 4): the banded self-join is linear only
if band buckets stay small — a degenerate band key space makes it
quadratic. This tool measures the actual bucket-size distribution at
16x the sf0.1 documents corpus (each replica's text perturbed per copy,
so replicas are near-dups, not exact dups — the adversarial case for
banding) and writes BENCH/DEDUP.md.

Usage: python tools/dedup_scale_bench.py [sf_dir] [repl]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def bucket_stats(bands_df, spark) -> dict:
    """Size distribution of (band, key) buckets + the self-join pair mass
    Σ s·(s-1)/2 — the actual number of candidate comparisons."""
    from pyspark.sql import functions as F
    sizes = bands_df.groupBy("band", "key").count()
    row = sizes.agg(
        F.count("*").alias("n_buckets"),
        F.max("count").alias("max"),
        F.expr("percentile_approx(count, 0.99)").alias("p99"),
        F.avg("count").alias("mean"),
        F.sum(F.col("count") * (F.col("count") - 1) / 2).alias("pair_mass"),
    ).collect()[0]
    return {k: (float(row[k]) if row[k] is not None else None)
            for k in ("n_buckets", "max", "p99", "mean", "pair_mass")}


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    repl = int(sys.argv[2]) if len(sys.argv) > 2 else 16

    from pyspark.sql import functions as F

    from libgeodesk_spark.operators import dedup
    from libgeodesk_spark.session import build_session

    spark = build_session("dedup-scale", cpus=int(
        os.environ.get("SPARK_GRAFT_CPUS", "32")))
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n0 = docs.count()
    # perturbed replication: every replica appends a distinct token, so
    # replicas are NEAR-duplicates (shared shingles, close simhash) — the
    # adversarial load for banding, unlike exact dups which collapse first
    r = F.explode(F.array(*[F.lit(i) for i in range(repl)])).alias("rep")
    big = (docs.select("*", r)
           .withColumn("doc_id", F.col("doc_id") * repl + F.col("rep"))
           .withColumn("text", F.concat_ws(" ", "text",
                                           F.format_string("rep%d", "rep")))
           .drop("rep"))
    n = big.count()

    out = {"sf": sf_dir, "repl": repl, "docs": n, "base_docs": n0}

    # --- simhash bands ---
    band_width = dedup.SIM_BITS // dedup.SIM_BANDS
    sim = dedup.simhash(big)
    bands = sim.select(
        F.col("doc_id").alias("id"),
        F.explode(F.array(*[
            F.struct(F.lit(i).alias("band"),
                     F.shiftright(F.col("simhash"), i * band_width)
                     .bitwiseAND(F.lit((1 << band_width) - 1)).alias("key"))
            for i in range(dedup.SIM_BANDS)])).alias("bk")) \
        .select("id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    t0 = time.time()
    out["simhash_buckets"] = bucket_stats(bands, spark)
    t0 = time.time()
    out["simhash_pairs"] = dedup.simhash_near_dups(big).count()
    out["simhash_near_dups_sec"] = round(time.time() - t0, 2)

    # --- minhash LSH bands ---
    rows_per_band = dedup.MH_PERMS // dedup.MH_BANDS
    sig = dedup.minhash_signatures(big)
    mbands = sig.select(
        F.col("doc_id").alias("id"),
        F.explode(F.array(*[
            F.struct(F.lit(bnd).alias("band"),
                     F.md5(F.concat_ws(",", *[
                         F.col(f"mh_{bnd * rows_per_band + rr}").cast("string")
                         for rr in range(rows_per_band)])).alias("key"))
            for bnd in range(dedup.MH_BANDS)])).alias("bk")) \
        .select("id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    out["minhash_buckets"] = bucket_stats(mbands, spark)
    t0 = time.time()
    out["minhash_pairs"] = dedup.minhash_lsh_pairs(big).count()
    out["minhash_lsh_sec"] = round(time.time() - t0, 2)

    n_pairs_brute = n * (n - 1) / 2
    sim_frac = out["simhash_buckets"]["pair_mass"] / n_pairs_brute
    mh_frac = out["minhash_buckets"]["pair_mass"] / n_pairs_brute

    md = [
        "# DEDUP — banding scale evidence",
        "",
        f"Corpus: `{sf_dir}` documents × {repl} perturbed replicas = "
        f"{n:,} docs (replicas are NEAR-dups — the adversarial banding "
        "load; exact dups would collapse in one groupBy).",
        "",
        "| path | buckets | max bucket | p99 | mean | candidate pairs "
        "(Σ s·(s-1)/2) | vs brute N²/2 | verified pairs | sec |",
        "|---|---|---|---|---|---|---|---|---|",
        (f"| simhash 60-bit, {dedup.SIM_BANDS}×{band_width}-bit bands "
         f"| {out['simhash_buckets']['n_buckets']:,.0f} "
         f"| {out['simhash_buckets']['max']:,.0f} "
         f"| {out['simhash_buckets']['p99']:,.0f} "
         f"| {out['simhash_buckets']['mean']:.1f} "
         f"| {out['simhash_buckets']['pair_mass']:,.0f} "
         f"| {sim_frac:.2e} | {out['simhash_pairs']:,} "
         f"| {out['simhash_near_dups_sec']} |"),
        (f"| MinHash {dedup.MH_PERMS} perms, {dedup.MH_BANDS} bands "
         f"| {out['minhash_buckets']['n_buckets']:,.0f} "
         f"| {out['minhash_buckets']['max']:,.0f} "
         f"| {out['minhash_buckets']['p99']:,.0f} "
         f"| {out['minhash_buckets']['mean']:.1f} "
         f"| {out['minhash_buckets']['pair_mass']:,.0f} "
         f"| {mh_frac:.2e} | {out['minhash_pairs']:,} "
         f"| {out['minhash_lsh_sec']} |"),
        "",
        "Reading: `candidate pairs` is the banded self-join's actual join "
        "output mass. Bounded",
        "max/p99 bucket sizes mean the join stays ~linear in corpus size; "
        "the `vs brute`",
        "column is the fraction of the quadratic all-pairs work the "
        "banding admits.",
        "",
        f"Raw: `{json.dumps(out)}`",
    ]
    path = os.path.join(REPO, "BENCH", "DEDUP.md")
    with open(path, "w") as f:
        f.write("\n".join(md) + "\n")
    print(json.dumps(out))
    print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
