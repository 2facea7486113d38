"""Incremental gold refresh (ST5 extension).

The reference recomputes everything every 120 s (server.js:280-302);
`streaming.refresh_once` reproduces that. For a steadily-growing chain
the full recompute is mostly wasted work: blocks below
`tip - reorg_depth` can no longer change (the standard bounded-reorg
assumption; the full recompute remains available as the fallback for
anything deeper).

Scheme — gold tables partitioned by height bucket, refreshed with
dynamic partition overwrite:

* `mining_info` / `block_info` are per-height outputs: recompute only
  rows with height >= tip - reorg_depth and overwrite just the
  affected `hbucket=` partitions. The height filter sits directly on
  the enriched-commits join output, so Catalyst prunes the untouched
  span.
* `miner_info` is a whole-history aggregate, so it keeps per-bucket
  *partial* aggregates (sums/counts decompose by bucket): affected
  buckets are re-aggregated and overwritten, then the final per-miner
  merge reads all partials — a table of O(miners x buckets) rows,
  thousands of times smaller than the commits it summarizes.

Every write stays atomic per partition; a crash mid-refresh leaves
whole old partitions, never torn rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import core

HEIGHTS_PER_BUCKET = 1000


def _hb(col: str = "stacks_block_height") -> F.Column:
    return (F.col(col) / HEIGHTS_PER_BUCKET).cast("long").alias("hbucket")


def _write_dynamic(df: DataFrame, path: str) -> None:
    (df.write.mode("overwrite")
     .option("partitionOverwriteMode", "dynamic")
     .partitionBy("hbucket")
     .parquet(path))


def miner_partials(prepared: dict[str, DataFrame],
                   bonus_height: int = core.BONUS_HEIGHT) -> DataFrame:
    """Per-(hbucket, miner) partials of every A1/A3 measure. All of
    them are sums/counts, so bucket partials merge exactly."""
    enriched = prepared["enriched"].withColumn("hbucket", _hb())
    stats = enriched.groupBy("hbucket", "leader_key_address").agg(
        F.count("*").alias("total_mined"),
        F.sum("burn_fee").alias("miner_burned"),
        F.sum("actual_burn").alias("total_burn"),
        F.sum(F.when(F.col("is_winner"), 1).otherwise(0)).alias("total_win"),
    )
    wins = (
        prepared["winners"]
        .withColumn("hbucket", _hb("stacks_height"))
        .groupBy("hbucket", "leader_key_address")
        .agg(F.count("*").alias("actual_win"),
             F.sum(F.when(F.col("stacks_height") < bonus_height, 1)
                   .otherwise(0)).alias("actual_win_bonus"))
    )
    return stats.join(wins, ["hbucket", "leader_key_address"], "full") \
        .na.fill(0, ["total_mined", "total_win", "actual_win",
                     "actual_win_bonus"])


def merge_miner_partials(partials: DataFrame) -> DataFrame:
    """Final per-miner merge -> the exact miner_info projection."""
    return (
        partials.groupBy("leader_key_address")
        .agg(F.sum("actual_win").alias("actual_win"),
             F.sum("actual_win_bonus").alias("actual_win_bonus"),
             F.sum("total_win").alias("total_win"),
             F.sum("total_mined").alias("total_mined"),
             F.sum("miner_burned").alias("miner_burned"))
        .select(
            F.col("leader_key_address").alias("stx_address"),
            "actual_win", "actual_win_bonus",
            "total_win", "total_mined", "miner_burned",
        )
        .orderBy("stx_address")
    )


def incremental_refresh(spark: SparkSession, tables: dict[str, DataFrame],
                        gold_dir: str, reorg_depth: int = 100) -> dict:
    """One incremental tick. Returns {'tip', 'lo_height', 'buckets'}."""
    prepared = core.prepare(tables)
    try:
        tip = prepared["snap"].agg(
            F.max("stacks_block_height").alias("t")).collect()[0].t
        lo = max(0, (tip or 0) - reorg_depth)
        lo_bucket = lo // HEIGHTS_PER_BUCKET
        affected = F.col("hbucket") >= lo_bucket

        mi = core.mining_info(tables, prepared=prepared) \
            .withColumn("hbucket", _hb()).filter(affected)
        bi = core.block_info(tables, prepared=prepared) \
            .withColumn("hbucket", _hb()).filter(affected)
        pt = miner_partials(prepared).filter(affected)

        _write_dynamic(mi, f"{gold_dir}/mining_info")
        _write_dynamic(bi, f"{gold_dir}/block_info")
        _write_dynamic(pt, f"{gold_dir}/miner_partials")

        merged = merge_miner_partials(
            spark.read.parquet(f"{gold_dir}/miner_partials"))
        merged.write.mode("overwrite").parquet(f"{gold_dir}/miner_info")
        return {"tip": tip, "lo_height": lo, "buckets_from": lo_bucket}
    finally:
        prepared["enriched"].unpersist()
