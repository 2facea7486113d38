"""End-to-end training-data pipeline compositions (SURVEY §7.4).

`clean_corpus` is the canonical 100-TB pre-training data flow:

    documents
      -> language filter        (text.lang_id heuristic)
      -> quality filter         (text.quality_score thresholds)
      -> exact dedup            (content-digest groupBy, keep lowest id)
      -> near-dup removal       (MinHash LSH candidates; drop the
                                 higher id of every candidate pair)
      -> cleaned corpus + per-stage survival counts

Shuffle budget: one groupBy on the content digest (uniform), one LSH
band self-join (bounded buckets after stop-shingle handling), one
left-anti join against the drop list (broadcast — the drop list is
pairs of near-dups, tiny relative to the corpus). The language/quality
stages are pure map-side column math fused into the first scan.

Every stage is md5-based column arithmetic, so the full pipeline is
DuckDB-oracle-checkable end to end (queries/dedup.py dp1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .operators import dedup as D
from .operators import text as T


def clean_corpus(docs: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id",
                 min_tokens: int = 10, min_quality: float = 0.3,
                 lang: str | None = "en",
                 jaccard_bands: int = 4, num_hashes: int = 16,
                 transitive: bool = False) -> DataFrame:
    """Returns the surviving documents (id + text) after the four
    cleaning stages. Deterministic keep-rule everywhere: the lowest
    doc id of a duplicate group survives.

    transitive=False drops the higher id of every candidate PAIR —
    cheap, but it can drop both B and C for pairs (A,C),(B,C) even
    though B only resembles C. transitive=True collapses candidate
    pairs into connected components (operators/components.py) and
    keeps exactly one representative per near-dup CLUSTER — the
    semantically right rule for a training corpus."""
    q = T.quality_score(docs, text_col, id_col).select(
        id_col, "n_tokens", "quality")
    l = T.lang_id(docs, text_col, id_col).select(id_col, "predicted_lang")
    kept = (
        docs.join(q, id_col).join(l, id_col)
        .filter(F.col("n_tokens") >= min_tokens)
        .filter(F.col("quality") >= min_quality)
    )
    if lang is not None:
        kept = kept.filter(F.col("predicted_lang") == lang)
    kept = kept.select(id_col, text_col)

    # exact dedup: keep the lowest id per content digest
    digests = kept.select(
        F.col(id_col),
        F.md5(D.normalize_text(F.col(text_col))).alias("_digest"),
    )
    keepers = digests.groupBy("_digest").agg(F.min(id_col).alias(id_col))
    kept = kept.join(keepers.select(id_col), id_col)

    # near-dup removal: LSH candidates among survivors
    cands = D.minhash_lsh_candidates(
        kept, text_col, id_col, num_hashes=num_hashes, bands=jaccard_bands)
    if transitive:
        from .operators.components import connected_components

        comp = connected_components(cands, "id1", "id2") \
            .withColumnRenamed("node", id_col)
        return (
            kept.join(comp, id_col, "left")
            .filter(F.col("component").isNull()
                    | (F.col("component") == F.col(id_col)))
            .select(id_col, text_col)
            .orderBy(id_col)
        )
    drops = cands.select(F.col("id2").alias(id_col)).distinct()
    return kept.join(drops, id_col, "left_anti").orderBy(id_col)


def survival_report(docs: DataFrame, cleaned: DataFrame,
                    id_col: str = "doc_id") -> DataFrame:
    """One-row funnel summary: corpus size in/out."""
    n_in = docs.count()
    n_out = cleaned.count()
    return docs.sparkSession.createDataFrame(
        [(n_in, n_out, round(n_out / n_in, 4) if n_in else 0.0)],
        "docs_in long, docs_out long, survival_rate double")


def stratified_sample(df: DataFrame, strata_col: str,
                      rates: dict[str, float], key_col: str = "doc_id",
                      default_rate: float = 1.0,
                      resolution: int = 10_000) -> DataFrame:
    """Deterministic per-stratum Bernoulli sampling — the class-
    rebalancing step of a training-data pipeline (downsample the
    dominant language/source, keep the rest). A row survives iff
    bucket(key, stratum) < rate[stratum] * resolution, with bucket =
    first 4 md5 hex digits of "key:stratum" mod resolution.

    No PRNG state: the decision is a pure function of (key, stratum),
    so it is stable under reshuffles/reruns/engines (unlike
    df.sampleBy, whose per-partition RNG draw changes with the
    partitioning) — which also makes it oracle-checkable. Map-side
    only: no shuffle at any scale."""
    # coalesce the stratum: a NULL stratum would null the md5 key and
    # silently DROP the row instead of sampling it at the default rate
    key = F.concat(F.col(key_col).cast("string"), F.lit(":"),
                   F.coalesce(F.col(strata_col).cast("string"), F.lit("")))
    bucket = F.pmod(
        F.conv(F.substring(F.md5(key), 1, 4), 16, 10).cast("long"),
        F.lit(resolution))
    # integer thresholds computed driver-side: no float cast whose
    # rounding could differ between engines
    thr = F.lit(int(default_rate * resolution))
    for stratum, r in rates.items():
        thr = F.when(F.col(strata_col) == stratum,
                     F.lit(int(r * resolution))).otherwise(thr)
    return (
        df.withColumn("_bucket", bucket)
        .filter(F.col("_bucket") < thr)
        .withColumnRenamed("_bucket", "sample_bucket")
    )


def pack_sequences(df: DataFrame, budget: int, token_count: Column,
                   order_by: list[Column],
                   id_cols: list[str]) -> DataFrame:
    """Assign documents to fixed-token-budget training packs: documents
    in deterministic order, each assigned to the pack where its first
    token lands (pack_id = starting_offset // budget). The LLM-batch
    sharding step: downstream workers read one pack's documents and
    tokenize exactly `budget`-ish tokens.

    The global running offset uses the two-phase range-sharded cumsum
    (operators/scalable.py) — no single-partition window, so the
    assignment scales to the full corpus."""
    from .operators.scalable import global_cumsum

    with_cum = global_cumsum(
        df.withColumn("_nt", token_count.cast("long")),
        order_by, F.col("_nt"), out_col="_cum")
    # integral div/mod, not double division: a corpus-wide token offset
    # can exceed 2^53, where double arithmetic would misassign packs
    start = with_cum.withColumn("_start", F.col("_cum") - F.col("_nt"))
    return start.select(
        *id_cols,
        F.col("_nt").alias("n_tokens"),
        F.expr(f"_start div {budget}").alias("pack_id"),
        F.pmod("_start", F.lit(budget)).cast("long").alias("pack_offset"),
    )
