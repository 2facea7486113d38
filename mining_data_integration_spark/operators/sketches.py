"""Mergeable summary sketches for frequency problems.

Misra-Gries heavy hitters (Misra & Gries 1982; merge rule from
Agarwal et al. 2013, "Mergeable summaries"): each partition folds its
rows into at most `s` (key, lower-bound) counters — the undercount is
bounded by n_p/(s+1) — so every key with global frequency > n/(s+1)
is guaranteed to survive in at least one partition's summary
(pigeonhole over partitions). The union of summaries is therefore a
small SUPERSET of the heavy hitters, and one exact counting pass
restricted to that candidate set (a broadcast semi-join) returns
exact frequencies.

Why this matters at 100 TB: a plain `groupBy(term).count()` shuffles
one row per distinct term — for web-scale token streams that is
billions of shuffle keys to answer a question about a few hundred.
Here the shuffle carries at most s × #partitions candidate summaries
plus the (candidate-filtered) exact counts; everything else dies
map-side. The summaries themselves are Arrow-batched pandas
`value_counts` merges, not per-row Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def misra_gries_summaries(df: DataFrame, col: str, s: int) -> DataFrame:
    """Per-partition Misra-Gries summaries: ≤ s rows per partition of
    (col, lb) where lb is a lower bound on the partition-local count
    undercounting by at most n_p/(s+1). State lives across the Arrow
    batches of one partition (mapInPandas receives the full partition
    as a batch iterator)."""
    field = df.schema[col]
    out_schema = f"`{col}` {field.dataType.simpleString()}, lb long"

    def summarize(batches):
        import pandas as pd

        counters: dict = {}
        for pdf in batches:
            for key, c in pdf[col].value_counts().items():
                counters[key] = counters.get(key, 0) + int(c)
            if len(counters) > s:
                # subtract the (s+1)-th largest count from everything;
                # ≤ s keys can exceed it, and each reduction removes
                # ≥ d·(s+1) total mass → Σ decrements ≤ n_p/(s+1)
                d = sorted(counters.values(), reverse=True)[s]
                counters = {k: c - d for k, c in counters.items() if c > d}
        if counters:
            yield pd.DataFrame(
                {col: list(counters.keys()), "lb": list(counters.values())})

    return df.select(col).mapInPandas(summarize, out_schema)


def heavy_hitters_exact(df: DataFrame, col: str, s: int) -> DataFrame:
    """Exact frequencies of every value with count > n/s, computed
    without shuffling the full distinct-key space: Misra-Gries
    candidates (a guaranteed superset, since n/s > n/(s+1)) prune the
    stream before the exact groupBy; a single-row total joins in as a
    broadcast literal, never a driver-side collect."""
    cands = misra_gries_summaries(df, col, s).select(col).distinct()
    total = df.select(F.count("*").alias("_n"))
    counts = (
        df.join(F.broadcast(cands), col, "left_semi")
        .groupBy(col)
        .agg(F.count("*").alias("cnt"))
    )
    return (
        counts.crossJoin(F.broadcast(total))
        .filter(F.col("cnt") * s > F.col("_n"))
        .drop("_n")
    )
