"""Similarity search over embedding columns.

* ``brute_topk`` — exact top-k neighbors by QUANTIZED squared-L2 distance:
  each float32 component is cast to double and rounded to an int
  (×1000), so distances are exact int64 and rankings are bit-reproducible
  across engines (the oracle-gate requirement). Pure Spark higher-order
  functions (transform / zip_with / aggregate) — JVM codegen, no UDFs.
* ``cosine_topk`` — float cosine variant (production metric; rows-only
  check since float summation order is engine-specific).
* ``lsh_bucket_topk`` — the scale path: sign-random-projection buckets
  (hyperplanes from the deterministic LCG), search only within the query's
  bucket ± multiprobe. Trades recall for a bucket-local scan; exactness is
  per-bucket.

Scale notes: brute force is O(Q·N) — fine for Q small (broadcast the
queries); the LSH variant turns the N side into bucket-pruned partitions.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

QUANT = 1000


def _quantized(col) -> "F.Column":
    return F.transform(col, lambda x: F.round(x.cast("double") * QUANT).cast("long"))


def quantized_sq_l2(a, b) -> "F.Column":
    d = F.zip_with(_quantized(a), _quantized(b), lambda x, y: (x - y) * (x - y))
    return F.aggregate(d, F.lit(0).cast("long"), lambda acc, v: acc + v)


def brute_topk(emb: DataFrame, query_ids: list[int], k: int,
               id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """(qid, vec_id, d2, rank) — exact top-k by quantized L2; self excluded;
    ties broken by vec_id."""
    q = emb.filter(F.col(id_col).isin(query_ids)) \
        .select(F.col(id_col).alias("qid"), F.col(vec_col).alias("qe"))
    pairs = emb.crossJoin(F.broadcast(q)).filter(F.col(id_col) != F.col("qid"))
    d2 = quantized_sq_l2(F.col("qe"), F.col(vec_col)).alias("d2")
    w = Window.partitionBy("qid").orderBy("d2", id_col)
    return (pairs.select("qid", F.col(id_col).alias("vec_id"), d2)
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))


def brute_topk_sql(query_ids: list[int], k: int, table: str = "embeddings",
                   id_col: str = "vec_id", vec_col: str = "embedding") -> str:
    ids = ",".join(str(i) for i in query_ids)
    qexpr = (f"CAST(round(CAST(x[1] AS DOUBLE) * {QUANT}) AS BIGINT)"
             f" - CAST(round(CAST(x[2] AS DOUBLE) * {QUANT}) AS BIGINT)")
    return f"""
    WITH q AS (SELECT {id_col} AS qid, {vec_col} AS qe FROM {table}
               WHERE {id_col} IN ({ids})),
    pairs AS (
      SELECT q.qid, e.{id_col} AS vec_id,
             CAST(list_sum(list_transform(list_zip(q.qe, e.{vec_col}),
                  x -> ({qexpr}) * ({qexpr}))) AS BIGINT) AS d2
      FROM {table} e CROSS JOIN q WHERE e.{id_col} <> q.qid)
    SELECT qid, vec_id, d2, CAST(rank AS BIGINT) AS rank FROM (
      SELECT *, row_number() OVER (PARTITION BY qid ORDER BY d2, vec_id) AS rank
      FROM pairs) WHERE rank <= {k}
    """


def cosine_topk(emb: DataFrame, query_ids: list[int], k: int,
                id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Float cosine top-k (production variant)."""
    q = emb.filter(F.col(id_col).isin(query_ids)) \
        .select(F.col(id_col).alias("qid"), F.col(vec_col).alias("qe"))
    pairs = emb.crossJoin(F.broadcast(q)).filter(F.col(id_col) != F.col("qid"))

    def dot(a, b):
        return F.aggregate(F.zip_with(a, b, lambda x, y: x.cast("double") * y),
                           F.lit(0.0), lambda acc, v: acc + v)

    cos = (dot(F.col("qe"), F.col(vec_col))
           / F.sqrt(dot(F.col("qe"), F.col("qe")))
           / F.sqrt(dot(F.col(vec_col), F.col(vec_col)))).alias("cos")
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), id_col)
    return (pairs.select("qid", F.col(id_col).alias("vec_id"), cos)
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))


# -- IVF (inverted file: coarse quantizer + probed lists) --------------------

IVF_LISTS = 16
IVF_NPROBE = 4


def ivf_centroids(emb: DataFrame, n_lists: int = IVF_LISTS,
                  id_col: str = "vec_id", vec_col: str = "embedding") -> np.ndarray:
    """Deterministic coarse quantizer: the vectors with the n_lists lowest
    ids serve as centroids (k-means would need an iterative job; for the
    scale path what matters is a FIXED, broadcastable quantizer — swap in
    trained centroids without touching the query path)."""
    rows = (emb.orderBy(id_col).limit(n_lists)
            .select(vec_col).collect())
    return np.array([r[0] for r in rows], dtype=np.float64)


def ivf_assign(emb: DataFrame, centroids: np.ndarray,
               vec_col: str = "embedding") -> DataFrame:
    """Tag each vector with its nearest-centroid list id — one Arrow pass,
    numpy matmul per batch (the batched cell-encode shape)."""
    spark = emb.sparkSession
    bc = spark.sparkContext.broadcast(centroids)
    from pyspark.sql import types as T
    # NOTE StructType.add mutates in place and df.schema is cached — build
    # a fresh StructType instead of mutating the source schema
    schema = T.StructType(list(emb.schema.fields)
                          + [T.StructField("list_id", T.IntegerType())])

    def assign(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            v = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            c = bc.value
            # ||v-c||² = ||v||² - 2 v·c + ||c||²; argmin over centroids
            d = (-2.0 * v @ c.T) + (c * c).sum(axis=1)[None, :]
            pdf = pdf.copy()
            pdf["list_id"] = d.argmin(axis=1).astype("int32")
            yield pdf

    return emb.mapInPandas(assign, schema=schema)


def ivf_topk(emb: DataFrame, query_ids: list[int], k: int,
             n_lists: int = IVF_LISTS, nprobe: int = IVF_NPROBE,
             id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """IVF search: exact quantized-L2 rank within the query's nprobe
    nearest lists. The assignment is one shuffle-free pass; at scale the
    assigned table is written list-partitioned so probes prune partitions
    (same storage trick as the cell layout)."""
    cents = ivf_centroids(emb, n_lists, id_col, vec_col)
    tagged = ivf_assign(emb, cents, vec_col)

    q = tagged.filter(F.col(id_col).isin(query_ids)) \
        .select(F.col(id_col).alias("qid"), F.col(vec_col).alias("qe"))
    # driver-side probe lists per query (q is tiny)
    qrows = q.collect()
    probe_rows = []
    for r in qrows:
        v = np.array(r["qe"], dtype=np.float64)
        d = ((cents - v) ** 2).sum(axis=1)
        for lid in np.argsort(d)[:nprobe]:
            probe_rows.append((r["qid"], int(lid)))
    spark = emb.sparkSession
    probes = spark.createDataFrame(probe_rows, "qid long, list_id int")
    qdf = q.join(F.broadcast(probes), "qid")

    cand = tagged.join(F.broadcast(qdf), "list_id") \
        .filter(F.col(id_col) != F.col("qid"))
    d2 = quantized_sq_l2(F.col("qe"), F.col(vec_col)).alias("d2")
    w = Window.partitionBy("qid").orderBy("d2", id_col)
    return (cand.select("qid", F.col(id_col).alias("vec_id"), d2)
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))


# -- LSH (sign random projection) -------------------------------------------

LSH_PLANES = 4
LSH_SEED = 0x9E3779B9


def _plane_component(p: int, i: int) -> float:
    """Deterministic pseudo-random hyperplane component in [-1, 1)."""
    h = (p * 2654435761 + i * 2246822519 + LSH_SEED) % (1 << 32)
    return (h / float(1 << 31)) - 1.0


def lsh_signature(vec_col, dim: int) -> "F.Column":
    """Bit b = sign of dot(vec, plane_b) — computed as a JVM expression."""
    sig = F.lit(0).cast("long")
    for p in range(LSH_PLANES):
        comps = [F.lit(_plane_component(p, i)) for i in range(dim)]
        dot = None
        for i in range(dim):
            term = F.element_at(vec_col, i + 1).cast("double") * comps[i]
            dot = term if dot is None else dot + term
        sig = sig + F.when(dot > 0, F.lit(1 << p)).otherwise(F.lit(0))
    return sig


def lsh_bucket_topk(emb: DataFrame, query_ids: list[int], k: int, dim: int = 64,
                    id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH bucket
    (plus hamming-1 multiprobe), exact quantized-L2 rank inside."""
    sig = lsh_signature(F.col(vec_col), dim).alias("bucket")
    tagged = emb.select(F.col(id_col), F.col(vec_col), sig)
    q = tagged.filter(F.col(id_col).isin(query_ids)) \
        .select(F.col(id_col).alias("qid"), F.col(vec_col).alias("qe"),
                F.col("bucket").alias("qbucket"))
    # multiprobe: bucket XOR {0, 1<<p}
    probes = F.explode(F.array(
        F.col("qbucket"),
        *[F.col("qbucket").bitwiseXOR(F.lit(1 << p)) for p in range(LSH_PLANES)]
    )).alias("bucket")
    qp = q.select("qid", "qe", probes)
    pairs = tagged.join(F.broadcast(qp), "bucket") \
        .filter(F.col(id_col) != F.col("qid"))
    d2 = quantized_sq_l2(F.col("qe"), F.col(vec_col)).alias("d2")
    w = Window.partitionBy("qid").orderBy("d2", id_col)
    return (pairs.select("qid", F.col(id_col).alias("vec_id"), d2)
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))
