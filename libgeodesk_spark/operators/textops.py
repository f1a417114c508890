"""Text analysis for training-data pipelines: token counting, quality
scoring, language-ID heuristic, document fingerprinting.

Each operator is defined TWICE from one spec: as Spark Columns (pure JVM,
whole-stage codegen — no UDFs anywhere here) and as DuckDB SQL text for
the correctness gate. All outputs are integers/strings so cross-engine
comparison is exact.

These have no reference-repo analog (libgeodesk is geospatial); they are
the training-data operator set required by the build instructions, built
in the same engine style.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

PUNCT = ".,;:!?"
DIGITS = "0123456789"

#: language-ID stopword table (padded-occurrence heuristic); tie-break
#: order is the table order.
LANG_STOPWORDS = {
    "en": (" the ", " and ", " of "),
    "fr": (" le ", " la ", " et "),
    "de": (" der ", " die ", " und "),
    "es": (" el ", " los ", " y "),
}


# ---------------------------------------------------------------------------
# Spark columns
# ---------------------------------------------------------------------------

def token_count_col(c: Column) -> Column:
    t = F.trim(c)
    return F.when(F.length(t) == 0, F.lit(0)) \
        .otherwise(F.size(F.split(t, r"\s+"))).cast("long")


def occurrences_col(c: Column, needle: str) -> Column:
    """Exact occurrence count via length arithmetic (no regex)."""
    return ((F.length(c) - F.length(F.replace(c, F.lit(needle), F.lit(""))))
            / F.lit(len(needle))).cast("long")


def punct_count_col(c: Column) -> Column:
    return (F.length(c) - F.length(F.translate(c, PUNCT, ""))).cast("long")


def digit_count_col(c: Column) -> Column:
    return (F.length(c) - F.length(F.translate(c, DIGITS, ""))).cast("long")


def _padded(c: Column) -> Column:
    return F.concat(F.lit(" "), F.lower(c), F.lit(" "))


def lang_scores_col(c: Column) -> dict[str, Column]:
    p = _padded(c)
    return {lang: sum(occurrences_col(p, w) for w in words).cast("long")
            for lang, words in LANG_STOPWORDS.items()}


def lang_id_col(c: Column) -> Column:
    s = lang_scores_col(c)
    langs = list(LANG_STOPWORDS)
    expr = F.lit(langs[-1])
    for lang in reversed(langs[:-1]):
        later = [s[x] for x in langs[langs.index(lang) + 1:]]
        cond = None
        for o in later:
            c2 = s[lang] >= o
            cond = c2 if cond is None else (cond & c2)
        expr = F.when(cond, F.lit(lang)).otherwise(expr)
    return expr


def fingerprint_col(c: Column) -> Column:
    return F.md5(F.lower(F.trim(c)))


def int_div(a: Column, b: Column) -> Column:
    """Exact integer floor-division on longs (matches DuckDB ``//`` for
    non-negative operands; avoids double-division truncation drift)."""
    return ((a - a % b) / b).cast("long")


def text_features(df: DataFrame, col: str = "text", id_col: str = "doc_id") -> DataFrame:
    c = F.col(col)
    n = F.length(c).cast("long")
    safe_n = F.greatest(n, F.lit(1))
    punct = punct_count_col(c)
    stop = sum(occurrences_col(_padded(c), w)
               for ws in LANG_STOPWORDS.values() for w in ws).cast("long")
    toks = token_count_col(c)
    return df.select(
        F.col(id_col),
        n.alias("n_chars_m"),
        toks.alias("n_tokens"),
        punct.alias("n_punct"),
        digit_count_col(c).alias("n_digits"),
        stop.alias("n_stopwords"),
        int_div(punct * 1000, safe_n).alias("punct_pm"),
        int_div(stop * 1000, F.greatest(toks, F.lit(1))).alias("stopword_pm"),
        lang_id_col(c).alias("lang_guess"),
        fingerprint_col(c).alias("fingerprint"),
    )


# ---------------------------------------------------------------------------
# DuckDB SQL mirrors
# ---------------------------------------------------------------------------

def _occ_sql(expr: str, needle: str) -> str:
    esc = needle.replace("'", "''")
    return (f"CAST((length({expr}) - length(replace({expr}, '{esc}', '')))"
            f" / {len(needle)} AS BIGINT)")


def _padded_sql(col: str) -> str:
    return f"(' ' || lower({col}) || ' ')"


def lang_id_sql(col: str) -> str:
    scores = {
        lang: " + ".join(_occ_sql(_padded_sql(col), w) for w in words)
        for lang, words in LANG_STOPWORDS.items()
    }
    langs = list(LANG_STOPWORDS)
    sql = f"'{langs[-1]}'"
    for lang in reversed(langs[:-1]):
        later = langs[langs.index(lang) + 1:]
        cond = " AND ".join(f"({scores[lang]}) >= ({scores[x]})" for x in later)
        sql = f"CASE WHEN {cond} THEN '{lang}' ELSE {sql} END"
    return sql


def text_features_sql(table: str = "documents", col: str = "text",
                      id_col: str = "doc_id") -> str:
    n = f"CAST(length({col}) AS BIGINT)"
    safe_n = f"greatest({n}, 1)"
    punct = f"CAST(length({col}) - length(translate({col}, '{PUNCT}', '')) AS BIGINT)"
    digits = f"CAST(length({col}) - length(translate({col}, '{DIGITS}', '')) AS BIGINT)"
    toks = (f"CASE WHEN length(trim({col})) = 0 THEN 0 ELSE "
            f"CAST(length(regexp_split_to_array(trim({col}), '\\s+')) AS BIGINT) END")
    stop = " + ".join(_occ_sql(_padded_sql(col), w)
                      for ws in LANG_STOPWORDS.values() for w in ws)
    return f"""
    SELECT {id_col},
           {n} AS n_chars_m,
           {toks} AS n_tokens,
           {punct} AS n_punct,
           {digits} AS n_digits,
           CAST({stop} AS BIGINT) AS n_stopwords,
           CAST(({punct} * 1000) // {safe_n} AS BIGINT) AS punct_pm,
           CAST((CAST({stop} AS BIGINT) * 1000) // greatest({toks}, 1) AS BIGINT) AS stopword_pm,
           {lang_id_sql(col)} AS lang_guess,
           md5(lower(trim({col}))) AS fingerprint
    FROM {table}
    """
