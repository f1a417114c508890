"""Composite training-data pipeline: the operators composed the way a
real 100 TB curation job chains them — quality gate → exact dedup
(keep-first) → embedding attach — in ONE Catalyst plan.

This is deliberately a composition, not new machinery: text_features
fuses into the documents scan (pure JVM), the dedup keep-list is a
groupBy on the fingerprint digest (one shuffle), and the embedding
attach is a key equi-join. At scale: the fingerprint shuffle and the
doc↔embedding join both hash-partition on the SAME key domain (doc id),
so with bucketed storage the join is co-located; the quality filter runs
BEFORE both shuffles, cutting them by the rejection rate — the order the
optimizer cannot discover by itself is encoded here.

Everything has a DuckDB mirror for the gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from libgeodesk_spark.operators.ann import QUANT, _quantized
from libgeodesk_spark.operators.textops import text_features, text_features_sql

MIN_TOKENS = 20       # reject micro-documents
MAX_PUNCT_PM = 150    # reject punctuation-soup (per-mille of chars)


def clean_corpus(docs: DataFrame, emb: DataFrame,
                 min_tokens: int = MIN_TOKENS,
                 max_punct_pm: int = MAX_PUNCT_PM) -> DataFrame:
    """(doc_id, n_tokens, punct_pm, lang_guess, norm_q2) — documents that
    pass the quality gate, survive exact dedup (lowest doc_id per
    fingerprint wins), joined to their embedding's quantized squared
    norm (the ANN-side sanity stat)."""
    feats = text_features(docs)
    q = feats.filter((F.col("n_tokens") >= min_tokens)
                     & (F.col("punct_pm") <= max_punct_pm))
    keep = q.groupBy("fingerprint").agg(F.min("doc_id").alias("doc_id"))
    kept = q.join(keep, ["fingerprint", "doc_id"])
    qe = _quantized(F.col("embedding"))
    norm = F.aggregate(qe, F.lit(0).cast("long"),
                       lambda acc, v: acc + v * v).alias("norm_q2")
    e = emb.select(F.col("vec_id").alias("doc_id"), norm)
    return kept.join(e, "doc_id").select(
        "doc_id", "n_tokens", "punct_pm", "lang_guess", "norm_q2")


def clean_corpus_sql(docs_table: str = "documents",
                     emb_table: str = "embeddings",
                     min_tokens: int = MIN_TOKENS,
                     max_punct_pm: int = MAX_PUNCT_PM) -> str:
    qexpr = f"CAST(round(CAST(x AS DOUBLE) * {QUANT}) AS BIGINT)"
    return f"""
    WITH feats AS ({text_features_sql(docs_table)}),
    q AS (SELECT * FROM feats
          WHERE n_tokens >= {min_tokens} AND punct_pm <= {max_punct_pm}),
    keep AS (SELECT fingerprint, MIN(doc_id) AS doc_id
             FROM q GROUP BY fingerprint),
    kept AS (SELECT q.* FROM q JOIN keep
             ON q.fingerprint = keep.fingerprint
            AND q.doc_id = keep.doc_id),
    e AS (SELECT vec_id AS doc_id,
                 CAST(list_sum(list_transform(embedding,
                      x -> ({qexpr}) * ({qexpr}))) AS BIGINT) AS norm_q2
          FROM {emb_table})
    SELECT kept.doc_id, n_tokens, punct_pm, lang_guess, norm_q2
    FROM kept JOIN e ON kept.doc_id = e.doc_id
    """
