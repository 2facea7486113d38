"""Text analysis for training-data pipelines (SURVEY.md §7.4): token
counting, quality scoring, language-ID heuristic, document
fingerprinting.

Everything is built-in column expressions (split/size/filter/md5) —
JVM-side, codegen-friendly, no Python in the hot path. Ratios divide
exact integers, so results are bit-deterministic and oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import normalize_text

# tiny embedded stopword list — enough for a ratio heuristic; a real
# pipeline would broadcast a per-language lexicon table
EN_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it", "for", "on")


def tokens(text_col: Column) -> Column:
    return F.split(normalize_text(text_col), " ")


def token_stats(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Whitespace token count + char/word-length stats per document."""
    toks = tokens(F.col(text_col))
    return df.select(
        F.col(id_col),
        F.size(toks).alias("n_tokens"),
        F.length(normalize_text(F.col(text_col))).alias("n_chars_norm"),
        # total word chars = chars − separators; exact ints
        (F.length(normalize_text(F.col(text_col))) - (F.size(toks) - 1)).alias(
            "n_word_chars"
        ),
        (
            (F.length(normalize_text(F.col(text_col))) - (F.size(toks) - 1))
            .cast("double") / F.size(toks).cast("double")
        ).alias("avg_token_len"),
    )


def stopword_ratio(text_col: Column,
                   stopwords: tuple[str, ...] = EN_STOPWORDS) -> Column:
    toks = tokens(text_col)
    hits = F.size(F.filter(toks, lambda w: w.isin(*stopwords)))
    return hits.cast("double") / F.size(toks).cast("double")


def quality_score(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Heuristic quality: stopword ratio (fluency proxy) and lexical
    diversity (unique/total tokens), combined 50/50. The components are
    exposed so downstream filters can threshold them independently."""
    toks = tokens(F.col(text_col))
    n = F.size(toks).cast("double")
    stop_ratio = (
        F.size(F.filter(toks, lambda w: w.isin(*EN_STOPWORDS))).cast("double") / n
    )
    uniq_ratio = F.size(F.array_distinct(toks)).cast("double") / n
    return df.select(
        F.col(id_col),
        F.size(toks).alias("n_tokens"),
        stop_ratio.alias("stopword_ratio"),
        uniq_ratio.alias("unique_ratio"),
        (stop_ratio * 0.5 + uniq_ratio * 0.5).alias("quality"),
    )


def lang_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
            threshold: float = 0.08) -> DataFrame:
    """N-gram-free language-ID heuristic: English-stopword hit ratio.
    Real pipelines swap in per-language lexicons / fastText; the
    engine-side shape (per-doc ratio -> argmax/threshold) is the same."""
    ratio = stopword_ratio(F.col(text_col))
    return df.select(
        F.col(id_col),
        ratio.alias("en_ratio"),
        F.when(ratio >= threshold, F.lit("en")).otherwise(F.lit("other")).alias(
            "predicted_lang"
        ),
    )


def fingerprint(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id", shards: int = 16) -> DataFrame:
    """Content fingerprint (md5 of normalized text) + shard bucket from
    the first hex digit — the partitioning key a 100 TB dedup job
    would repartition on."""
    fp = F.md5(normalize_text(F.col(text_col)))
    return df.select(
        F.col(id_col),
        fp.alias("fingerprint"),
        (F.instr(F.lit("0123456789abcdef"), F.substring(fp, 1, 1)) - 1).alias(
            "shard"
        ),
    )
