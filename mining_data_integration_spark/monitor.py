"""E2 dashboard shapers (SURVEY §3 E2): pure DataFrame post-processing
over the three gold tables (miner_info / mining_info / block_info),
re-expressing mining_monitor_rpc.js:1-161.

Window strategy at scale: every trailing-N window here is bounded by a
constant (20 / 50 / 1000 rows — mining_monitor_rpc.js:3, 26, 48), so the
unpartitioned row_number over block height is a top-K problem
(TakeOrderedAndProject), not a full-table sort; the per-address
cumulative/forward-fill windows partition on address — the natural
shuffle key, uniform by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def trailing(df: DataFrame, n: int, height_col: str) -> DataFrame:
    """W1: the last n rows by height (mining_monitor_rpc.js:3, 25, 48).

    Distributed top-K (TakeOrderedAndProject — per-partition heads
    merged on the driver, n*P rows moved), not a global row_number
    window (which would single-partition-sort the whole table).
    Heights are unique per gold-table row, so the row set is identical."""
    return df.orderBy(F.desc(height_col)).limit(n)


def current_status(block_info: DataFrame, n: int = 20) -> DataFrame:
    """A9 (mining_monitor_rpc.js:1-21): trailing-n means of burn fees
    and miner counts + the raw height-ascending arrays."""
    tail = trailing(block_info, n, "stacks_block_height")
    return tail.agg(
        F.avg("sum_burn_fees").alias("avg_burn_fee"),
        F.avg("sum_miner_amount").alias("avg_miner_amount"),
        F.array_sort(
            F.collect_list(F.struct("stacks_block_height", "sum_burn_fees"))
        ).alias("burn_fee_points"),
        F.array_sort(
            F.collect_list(F.struct("stacks_block_height", "sum_miner_amount"))
        ).alias("miner_amount_points"),
        F.max("stacks_block_height").alias("tip_height"),
    )


def miner_table(mining_info: DataFrame, n: int = 50) -> DataFrame:
    """O9 (mining_monitor_rpc.js:26, 41): dashboard table = first 50
    tip-first mining_info rows."""
    return (
        mining_info.orderBy(F.desc("stacks_block_height"), "stx_address")
        .limit(n)
    )


def explode_commits(block_info: DataFrame) -> DataFrame:
    """F15 (mining_monitor_rpc.js:28-37): flatten commit_value_list ->
    one row per (height, address, fee)."""
    return block_info.select(
        "stacks_block_height",
        F.explode("commit_value_list").alias("c"),
    ).select(
        "stacks_block_height",
        F.col("c.leader_key_address").alias("address"),
        F.col("c.burn_fee").alias("burn_fee"),
    )


def burn_fee_area(block_info: DataFrame, n: int = 1000) -> DataFrame:
    """The showcase window chain (mining_monitor_rpc.js:46-113):
    W1 tail-n -> F15 explode -> W2 per-address cumulative sum ->
    W3 duplicate-height keep-last -> W4/W5 forward-fill to the tip.

    Output: dense long-format series (height, address, cum_burn_fee)
    with one point per height from each address's first commit to the
    global tip."""
    tail = trailing(block_info, n, "stacks_block_height")
    # commits with no registered leader key have a NULL address: they
    # can't key a per-miner series (and NULL never joins back to the
    # spine) — the chart covers identified miners only
    pts = explode_commits(tail).filter(F.col("address").isNotNull())

    # W2: running sum per address, height-ascending
    w_cum = (
        Window.partitionBy("address")
        .orderBy("stacks_block_height")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    series = pts.withColumn("cum_burn_fee", F.sum("burn_fee").over(w_cum))

    # W3: collapse duplicate heights keeping the last (largest) point
    w_dup = Window.partitionBy("address", "stacks_block_height").orderBy(
        F.desc("cum_burn_fee"))
    series = (
        series.withColumn("_rn", F.row_number().over(w_dup))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "burn_fee")
    )

    # W4/W5: dense spine per address (first point .. global tip), then
    # forward-fill. sequence+explode stays JVM-side; the spine adds at
    # most (#addresses x n) rows — bounded by the trailing window.
    tip = tail.agg(F.max("stacks_block_height").alias("tip"))
    bounds = (
        series.groupBy("address")
        .agg(F.min("stacks_block_height").alias("h0"))
        .crossJoin(F.broadcast(tip))
    )
    spine = bounds.select(
        "address",
        F.explode(F.sequence("h0", "tip")).alias("stacks_block_height"),
    )
    w_fill = (
        Window.partitionBy("address")
        .orderBy("stacks_block_height")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        spine.join(series, ["address", "stacks_block_height"], "left")
        .withColumn(
            "cum_burn_fee",
            F.last("cum_burn_fee", ignorenulls=True).over(w_fill),
        )
        .orderBy("address", "stacks_block_height")
    )


def monitor_integrate(golds: dict[str, DataFrame],
                      tail_status: int = 20,
                      tail_area: int = 1000) -> dict[str, DataFrame]:
    """E2 composite (packMiningMonitorData, mining_monitor_rpc.js:
    151-161): the five dashboard sections as one dict of DataFrames.
    The RR section is empty in the reference (dead endpoint,
    mining_monitor_rpc.js:142-149) — kept empty for parity."""
    mi = golds["miner_info"]
    return {
        "current_status": current_status(golds["block_info"], tail_status),
        "miner_table": miner_table(golds["mining_info"]),
        "burn_fee_area": burn_fee_area(golds["block_info"], tail_area),
        "winner_pie": winner_pie(mi),
        "rr": mi.sparkSession.createDataFrame(
            [], "address string, RR double"),
    }


def winner_pie(miner_info: DataFrame) -> DataFrame:
    """F14 (mining_monitor_rpc.js:115-140): pie payload
    {address, number, RR} from a miner_info table (all / r1000 / r100)."""
    rr = F.col("RR") if "RR" in miner_info.columns else F.lit(None).cast("double")
    return miner_info.select(
        F.col("stx_address").alias("address"),
        F.col("actual_win").alias("number"),
        rr.alias("RR"),
    ).orderBy("address")
