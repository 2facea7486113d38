"""Scalable global-order window operators.

A ``Window.orderBy(...)`` with no ``partitionBy`` forces every row
through ONE partition (Spark warns: "No Partition Defined for Window
operation"). Fine for a bounded series (the canonical chain, a date
spine); fatal for a fact table at 100 TB. The reference itself computes
these shapes single-threaded over JS arrays (pagination slices
server.js:151-187, running sums mining_monitor_rpc.js:50-70), so it has
the same scaling wall — this module is the Spark-native fix.

Two-phase pattern (the classic distributed prefix computation):

1. ``repartitionByRange`` on the order key — rows land in height-sorted
   shards, each shard's key range disjoint and ordered;
2. run the window WITHIN each shard (``partitionBy(shard)`` — fully
   parallel, no single-partition exchange on the big data);
3. compute one summary row per shard (count / sum / last value — a few
   hundred rows total), prefix-scan THAT tiny table, and broadcast-join
   the per-shard offsets back.

The only single-partition window left runs over #shards rows, not
#data rows. Requires a *total* order (callers pass a unique tiebreak
key, same rule every deterministic query here already follows).

``repartitionByRange`` boundaries come from reservoir sampling with a
fixed seed over a fixed input partitioning — deterministic, and the
planner reuses the exchange across the summary/join branches
(ReusedExchange), so shard ids are consistent within the plan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_PID = "_sc_pid"
_LRN = "_sc_lrn"
_OFF = "_sc_off"


def _sharded(df: DataFrame, order_by: list[Column],
             num_partitions: int | None) -> DataFrame:
    n = num_partitions or int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    return (
        df.repartitionByRange(n, *order_by)
        .withColumn(_PID, F.spark_partition_id())
    )


def _prefix_offsets(per_shard: DataFrame, measure: str) -> DataFrame:
    """Exclusive prefix scan over the per-shard summary table (tiny:
    one row per shard — the single-partition window is bounded by the
    shard count, not the data)."""
    w = Window.orderBy(_PID).rowsBetween(Window.unboundedPreceding, -1)
    return per_shard.withColumn(
        _OFF, F.coalesce(F.sum(measure).over(w), F.lit(0))
    ).select(_PID, _OFF)


def global_row_number(df: DataFrame, order_by: list[Column],
                      rn_col: str = "rn",
                      num_partitions: int | None = None) -> DataFrame:
    """Globally-ordered row_number() without a single-partition window.

    ``order_by`` must be a total order (include a unique key). The
    result column is LongType — at the scale that motivates this
    operator, IntegerType row numbers overflow.
    """
    part = _sharded(df, order_by, num_partitions)
    w_local = Window.partitionBy(_PID).orderBy(*order_by)
    local = part.withColumn(_LRN, F.row_number().over(w_local))
    counts = local.groupBy(_PID).agg(F.count("*").alias("_cnt"))
    offsets = _prefix_offsets(counts, "_cnt")
    return (
        local.join(F.broadcast(offsets), _PID)
        .withColumn(rn_col, (F.col(_LRN) + F.col(_OFF)).cast("long"))
        .drop(_PID, _LRN, _OFF)
    )


def global_cumsum(df: DataFrame, order_by: list[Column], value: Column,
                  out_col: str = "cum",
                  num_partitions: int | None = None) -> DataFrame:
    """Globally-ordered running sum (rows unbounded-preceding..current)
    as shard-local cumsum + broadcast per-shard offsets. Pass an exact
    (decimal/long) ``value`` — offsets are added per row, so float
    rounding would differ from the one-pass result."""
    part = _sharded(df, order_by, num_partitions)
    w_local = (
        Window.partitionBy(_PID).orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = part.withColumn("_lcum", F.sum(value).over(w_local))
    totals = part.groupBy(_PID).agg(F.sum(value).alias("_ptot"))
    offsets = _prefix_offsets(totals, "_ptot")
    return (
        local.join(F.broadcast(offsets), _PID)
        .withColumn(out_col, F.col("_lcum") + F.col(_OFF))
        .drop(_PID, "_lcum", _OFF)
    )


def global_lag(df: DataFrame, order_by: list[Column], value: Column,
               out_col: str = "prev",
               num_partitions: int | None = None) -> DataFrame:
    """Globally-ordered lag(value, 1): shard-local lag, with each
    shard's first row patched from the previous shard's last value
    (one boundary row per shard, broadcast back)."""
    part = _sharded(df, order_by, num_partitions)
    w_local = Window.partitionBy(_PID).orderBy(*order_by)
    w_shard = Window.partitionBy(_PID)
    local = (
        part.withColumn("_llag", F.lag(value).over(w_local))
        .withColumn(_LRN, F.row_number().over(w_local))
        .withColumn("_pcnt", F.count("*").over(w_shard))
    )
    # last row of each shard -> boundary value for the NEXT shard
    bounds = (
        local.filter(F.col(_LRN) == F.col("_pcnt"))
        .select((F.col(_PID) + 1).alias(_PID), value.alias("_prev_shard"))
    )
    return (
        local.join(F.broadcast(bounds), _PID, "left")
        .withColumn(
            out_col,
            F.when(F.col(_LRN) == 1, F.col("_prev_shard"))
            .otherwise(F.col("_llag")),
        )
        .drop(_PID, _LRN, "_llag", "_pcnt", "_prev_shard")
    )
