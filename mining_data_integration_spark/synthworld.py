"""Distributed synthetic mining world for operational benchmarks.

Generates the four E1 input tables (snapshots, block_commits,
leader_keys, block_headers — FIXTURES.md schemas) at an arbitrary chain
length entirely with `spark.range` expressions: nothing materializes on
the driver, so the same generator scales from the 1k-block unit-test
world to the 100k-block refresh benchmark and beyond.

Chain shape: block b has hash h(b) and parent h(b-1); one stacks block
per burn block; plus off-chain twins at 1% of heights (a pox-invalid
sortition re-run and a dead fork row) so the canonical walk does real
exclusion work without truncating the chain (an invalid row ON the
chain truncates it — reference semantics rpc.js:156-175, covered by the
golden tests, but a trivial walk to benchmark).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .schemas import cast_amounts


def synth_mining_world(spark: SparkSession, n_blocks: int,
                       commits_per_block: int,
                       n_miners: int = 200) -> dict[str, DataFrame]:
    h = lambda c: F.lpad(F.conv(c.cast("string"), 10, 16), 64, "0")
    blocks = spark.range(n_blocks).select(
        (F.col("id") + 1000).alias("bh"),
    )
    snapshots = blocks.select(
        F.col("bh").alias("block_height"),
        h(F.col("bh")).alias("burn_header_hash"),
        h(F.col("bh") - 1).alias("parent_burn_header_hash"),
        h(F.col("bh") + 10_000_000).alias("consensus_hash"),
        F.lit(1).alias("pox_valid"),
        (F.col("bh") * 1000).cast("string").alias("total_burn"),
        h(F.col("bh") * commits_per_block).alias("winning_block_txid"),
        F.col("bh").alias("stacks_block_height"),
    )
    twins = snapshots.filter(F.col("block_height") % 100 == 13)
    invalid = twins.withColumn(
        "burn_header_hash", h(F.col("block_height") + 20_000_000)
    ).withColumn("pox_valid", F.lit(0))
    fork = twins.withColumn(
        "burn_header_hash", h(F.col("block_height") + 40_000_000))
    snapshots = snapshots.unionByName(invalid).unionByName(fork)

    commits = (
        blocks.select(
            "bh",
            F.explode(F.sequence(F.lit(0), F.lit(commits_per_block - 1)))
            .alias("c"),
        )
        .select(
            h(F.col("bh")).alias("burn_header_hash"),
            h(F.col("bh") * commits_per_block + F.col("c")).alias("txid"),
            ((F.col("bh") + F.col("c")) % 9999 + 1).cast("string")
            .alias("burn_fee"),
            F.lit(1000).alias("key_block_ptr"),
            ((F.col("bh") + F.col("c")) % n_miners).cast("int")
            .alias("key_vtxindex"),
            F.lit("s").alias("apparent_sender"),
        )
    )
    leader_keys = spark.range(n_miners).select(
        h(F.lit(1000)).alias("burn_header_hash"),
        F.lit(1000).alias("block_height"),
        F.col("id").cast("int").alias("vtxindex"),
        F.concat(F.lit("MINER_"), F.col("id")).alias("address"),
    )
    headers = blocks.select(
        h(F.col("bh")).alias("burn_header_hash"),
        h(F.col("bh") + 30_000_000).alias("block_hash"),
        F.when(F.col("bh") == 1000, F.lit("0" * 64))
        .otherwise(h(F.col("bh") - 1 + 30_000_000)).alias("parent_block"),
        h(F.col("bh") + 10_000_000).alias("consensus_hash"),
        (F.col("bh") - 1000).alias("block_height"),
    )
    return {
        "snapshots": cast_amounts("snapshots", snapshots),
        "block_commits": cast_amounts("block_commits", commits),
        "leader_keys": leader_keys,
        "block_headers": headers,
    }


def land_as_parquet(tables: dict[str, DataFrame], path: str,
                    spark: SparkSession) -> dict[str, DataFrame]:
    """Write the generated world as parquet bronze and read it back, so
    downstream timings measure file-scan pipelines (as production
    would), not the generator expressions."""
    for name, df in tables.items():
        df.write.mode("overwrite").parquet(f"{path}/{name}")
    return {n: spark.read.parquet(f"{path}/{n}") for n in tables}
