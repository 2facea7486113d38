"""Oracle-checked text-analysis queries over the documents table
(SURVEY.md §7.4): token stats, quality scoring, language-ID heuristic,
fingerprint sharding. Implementations in operators/text.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import text as TX
from ._util import spread, t

_NORM = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
_TOKS = f"string_split({_NORM}, ' ')"
_STOPLIST = ", ".join(f"'{w}'" for w in TX.EN_STOPWORDS)


def tx1_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(t(spark, sf_dir, "documents"), "doc_id")
    return TX.token_stats(docs).orderBy("doc_id")


def tx2_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(t(spark, sf_dir, "documents"), "doc_id")
    return TX.quality_score(docs).orderBy("doc_id")


def tx3_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language ID + per-language confusion counts against
    the labeled lang column."""
    docs = spread(t(spark, sf_dir, "documents"), "doc_id")
    pred = TX.lang_id(docs).join(docs.select("doc_id", "lang"), "doc_id")
    return (
        pred.groupBy("lang", "predicted_lang")
        .agg(F.count("*").alias("n"))
        .orderBy("lang", "predicted_lang")
    )


def tx4_fingerprint_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fingerprint + shard distribution (the dedup partitioning key)."""
    docs = spread(t(spark, sf_dir, "documents"), "doc_id")
    return (
        TX.fingerprint(docs)
        .groupBy("shard")
        .agg(F.count("*").alias("n_docs"), F.min("fingerprint").alias("min_fp"))
        .orderBy("shard")
    )


QUERIES = {
    "tx1_token_stats": tx1_token_stats,
    "tx2_quality_score": tx2_quality_score,
    "tx3_lang_id": tx3_lang_id,
    "tx4_fingerprint_shards": tx4_fingerprint_shards,
}

ORACLES = {
    "tx1_token_stats": f"""
        WITH base AS (
            SELECT doc_id, {_NORM} AS norm, {_TOKS} AS toks FROM documents
        )
        SELECT doc_id,
               len(toks) AS n_tokens,
               length(norm) AS n_chars_norm,
               length(norm) - (len(toks) - 1) AS n_word_chars,
               CAST(length(norm) - (len(toks) - 1) AS DOUBLE)
                   / CAST(len(toks) AS DOUBLE) AS avg_token_len
        FROM base ORDER BY doc_id
    """,
    "tx2_quality_score": f"""
        WITH base AS (
            SELECT doc_id, {_TOKS} AS toks FROM documents
        ), ratios AS (
            SELECT doc_id,
                   len(toks) AS n_tokens,
                   CAST(len(list_filter(toks, w -> w IN ({_STOPLIST}))) AS DOUBLE)
                       / CAST(len(toks) AS DOUBLE) AS stopword_ratio,
                   CAST(len(list_distinct(toks)) AS DOUBLE)
                       / CAST(len(toks) AS DOUBLE) AS unique_ratio
            FROM base
        )
        SELECT doc_id, n_tokens, stopword_ratio, unique_ratio,
               stopword_ratio * 0.5 + unique_ratio * 0.5 AS quality
        FROM ratios ORDER BY doc_id
    """,
    "tx3_lang_id": f"""
        WITH base AS (
            SELECT doc_id, lang, {_TOKS} AS toks FROM documents
        ), pred AS (
            SELECT doc_id, lang,
                   CASE WHEN CAST(len(list_filter(toks, w -> w IN ({_STOPLIST}))) AS DOUBLE)
                             / CAST(len(toks) AS DOUBLE) >= 0.08
                        THEN 'en' ELSE 'other' END AS predicted_lang
            FROM base
        )
        SELECT lang, predicted_lang, count(*) AS n
        FROM pred GROUP BY lang, predicted_lang
        ORDER BY lang, predicted_lang
    """,
    "tx4_fingerprint_shards": f"""
        WITH fp AS (
            SELECT doc_id, md5({_NORM}) AS fingerprint,
                   strpos('0123456789abcdef', substring(md5({_NORM}), 1, 1)) - 1 AS shard
            FROM documents
        )
        SELECT shard, count(*) AS n_docs, min(fingerprint) AS min_fp
        FROM fp GROUP BY shard ORDER BY shard
    """,
}
