"""Sessionization + as-of join — time-series operators the reference
lacks (its only clock is block height) but any event pipeline needs.

* Gap-based sessionization: lag + flag + running sum — one shuffle on
  the session key, everything else window work inside the partition.
* As-of join: Spark has no native ASOF; the scalable composition is
  union-tag + last(ignorenulls) over (key ORDER BY ts) — a single
  shuffle on the key, no range-condition nested-loop blowup. (The
  alternative, applyInPandas + pd.merge_asof per key, drops to Python;
  this version stays in the JVM.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(events: DataFrame, key: str = "user_id", ts: str = "ts",
               gap_minutes: int = 30) -> DataFrame:
    """Assign gap-based session ids: a new session starts when the gap
    from the previous event of the same key exceeds `gap_minutes`."""
    w = Window.partitionBy(key).orderBy(ts, "event_id")
    gap_us = gap_minutes * 60 * 1_000_000
    prev = F.lag(F.unix_micros(F.col(ts))).over(w)
    new_sess = F.when(
        prev.isNull() | (F.unix_micros(F.col(ts)) - prev > gap_us), 1
    ).otherwise(0)
    w_cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return events.withColumn("session_idx", F.sum(new_sess).over(w_cum))


def session_stats(events: DataFrame, key: str = "user_id", ts: str = "ts",
                  gap_minutes: int = 30) -> DataFrame:
    """Per-session rollup: event count, span, value sum."""
    s = sessionize(events, key, ts, gap_minutes)
    return s.groupBy(key, "session_idx").agg(
        F.count("*").alias("n_events"),
        F.min("event_id").alias("first_event_id"),
        (
            F.unix_micros(F.max(ts)) - F.unix_micros(F.min(ts))
        ).alias("duration_us"),
    )


def asof_join(left: DataFrame, right: DataFrame, key: str,
              left_ts: str, right_ts: str,
              right_payload: list[str]) -> DataFrame:
    """For each left row, attach the latest right row with
    right_ts <= left_ts (inner semantics: unmatched left rows drop).

    Union-tag composition: right rows carry payload, left rows carry
    nulls; one window pass per key forward-fills the latest payload
    onto each left row. Equal timestamps order right-before-left, so
    a right row AT the left timestamp matches (<= semantics, like
    DuckDB/kdb asof)."""
    lcols = left.columns
    rtypes = dict(right.dtypes)
    # payload travels as ONE struct so the forward-fill can't pick
    # different right rows per column when payload values are NULL
    payload_type = ", ".join(f"`{c}`: {rtypes[c]}" for c in right_payload)
    r = right.select(
        F.col(key),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.struct(*[F.col(c) for c in right_payload]).alias("_r"),
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c)
          for c in lcols if c != key],
    )
    l = left.select(
        F.col(key),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(f"struct<{payload_type}>").alias("_r"),
        *[F.col(c) for c in lcols if c != key],
    )
    u = r.unionByName(l)
    w = (
        Window.partitionBy(key)
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.select(
        key, "_side",
        *[F.col(c) for c in lcols if c != key],
        F.last("_r", ignorenulls=True).over(w).alias("_asof"),
    )
    return filled.filter(
        (F.col("_side") == 1) & F.col("_asof").isNotNull()
    ).select(
        key,
        *[F.col(c) for c in lcols if c != key],
        *[F.col(f"_asof.{c}").alias(f"asof_{c}") for c in right_payload],
    )
