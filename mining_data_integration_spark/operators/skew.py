"""Skew-mitigation utilities (SURVEY §4 / 100-TB design).

AQE's skew-join splitting (`spark.sql.adaptive.skewJoin`, on in
session.py) handles sort-merge skew at runtime; these helpers cover the
cases AQE cannot re-plan:

* `salted_join` — when one join key dominates (the mining world's
  ZERO64 sentinel, a viral document's shingle, an LSH hot bucket), a
  shuffled join sends the whole hot key to one task. Salting splits the
  hot key S ways: the big side derives a deterministic salt from a
  high-cardinality column; the small side is replicated S times. The
  result is row-identical to the plain join.
* `two_stage_agg` — per-key aggregates over a hot key: partial agg on
  (key, salt) spreads the hot key across tasks, then a tiny final agg
  merges S partials. (Spark's hash aggregate already does map-side
  partials; this helps the *merge* stage when one key's partials
  overwhelm a reducer — relevant for high-cardinality payloads like
  collect_list.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, from_col: str, buckets: int,
              salt_col: str = "_salt") -> DataFrame:
    """Deterministic salt in [0, buckets): hash of a high-cardinality
    column (NOT the join key — salting must split rows that share the
    key)."""
    return df.withColumn(
        salt_col, F.pmod(F.xxhash64(F.col(from_col)), F.lit(buckets))
    )


def salted_join(big: DataFrame, small: DataFrame, key: str,
                buckets: int, salt_from: str,
                how: str = "inner") -> DataFrame:
    """Equi-join with the hot-key shuffle split `buckets` ways.

    big:   salted per-row from `salt_from` (any well-distributed col);
    small: replicated once per salt value (explode of a literal range —
           cost = |small| x buckets rows, the standard trade).
    """
    b = with_salt(big, salt_from, buckets)
    s = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(buckets)]))
    )
    return b.join(s, [key, "_salt"], how).drop("_salt")


def two_stage_agg(df: DataFrame, key: str, salt_from: str, buckets: int,
                  partial_aggs: list[Column], final_aggs: list[Column]) -> DataFrame:
    """groupBy(key, salt).agg(partial) -> groupBy(key).agg(final).
    Caller pairs partials/finals (sum/sum, count/sum, ...)."""
    salted = with_salt(df, salt_from, buckets)
    partial = salted.groupBy(key, "_salt").agg(*partial_aggs)
    return partial.groupBy(key).agg(*final_aggs)
