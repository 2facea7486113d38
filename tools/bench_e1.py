"""Operational-parity benchmark (BASELINE.md): time one full E1 gold
refresh — canonical snapshot chain, five joins, miner/mining/block info,
including the pointer-doubling fork walk — on a synthetic mining world
of N burn blocks, M miners, ~C commits/block.

The reference recomputes everything each 120 s tick (server.js:444-446)
on a real chain of O(100k) burn blocks; this script shows the Spark DAG
holds that budget with headroom at the same and larger scales.

Usage: python tools/bench_e1.py [n_blocks] [commits_per_block]
Prints one JSON line {"metric": "e1_refresh_wall", ...}.

The synthetic world is generated distributed (spark.range — no driver
materialization): block b has hash h(b), parent h(b-1), one stacks
block per burn block, plus a 1%% orphan fork branch and 1%% pox-invalid
rows so the walk does real exclusion work.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from mining_data_integration_spark import core, streaming
from mining_data_integration_spark.session import get_spark


def synth_tables(spark, n_blocks: int, commits_per_block: int, n_miners: int):
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
    # off-chain twins at 1% of heights: a pox-invalid sortition re-run
    # and a dead fork row — excluded by F1/F2 without breaking the
    # canonical links, so the walk covers the full n_blocks chain
    # (an invalid row ON the chain truncates it — reference semantics,
    # covered by the golden tests, but a trivial walk to benchmark)
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
    from mining_data_integration_spark.schemas import cast_amounts
    return {
        "snapshots": cast_amounts("snapshots", snapshots),
        "block_commits": cast_amounts("block_commits", commits),
        "leader_keys": leader_keys,
        "block_headers": headers,
    }


def main() -> None:
    n_blocks = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    cpb = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = get_spark("bench-e1")

    tables = synth_tables(spark, n_blocks, cpb, n_miners=200)
    # land as parquet bronze so the timed run reads files (as production
    # would), not the generator expressions
    bronze = "/tmp/bench_e1_bronze"
    for name, df in tables.items():
        df.write.mode("overwrite").parquet(f"{bronze}/{name}")
    tables = {n: spark.read.parquet(f"{bronze}/{n}")
              for n in tables}

    t0 = time.perf_counter()
    golds = streaming.e1_gold_tables(tables)
    counts = {name: df.count() for name, df in golds.items()}
    wall = round(time.perf_counter() - t0, 2)

    # steady-state incremental tick: bootstrap the partitioned gold,
    # then time one bounded-reorg refresh (the production cadence)
    from mining_data_integration_spark.incremental import incremental_refresh
    from mining_data_integration_spark.io import write_bronze_commits
    gold_dir = "/tmp/bench_e1_gold"
    incremental_refresh(spark, tables, gold_dir, reorg_depth=10 ** 12)
    t0 = time.perf_counter()
    incremental_refresh(spark, tables, gold_dir, reorg_depth=1000)
    inc_wall = round(time.perf_counter() - t0, 2)

    # same tick against height-bucketed bronze commits: the commits
    # scan partition-prunes to the reorg window
    bronze = "/tmp/bench_e1_bronze_commits"
    write_bronze_commits(tables["block_commits"], tables["snapshots"], bronze)
    t2 = dict(tables)
    t2["block_commits"] = spark.read.parquet(bronze)
    gold2 = "/tmp/bench_e1_gold_bb"
    incremental_refresh(spark, t2, gold2, reorg_depth=10 ** 12)
    t0 = time.perf_counter()
    incremental_refresh(spark, t2, gold2, reorg_depth=1000)
    inc_bb_wall = round(time.perf_counter() - t0, 2)

    print(json.dumps({
        "metric": "e1_refresh_wall", "value": wall, "unit": "sec",
        "incremental_tick_sec": inc_wall,
        "incremental_tick_bucketed_bronze_sec": inc_bb_wall,
        "n_blocks": n_blocks, "commits_per_block": cpb,
        "budget_sec": 120, "gold_rows": counts,
    }))


if __name__ == "__main__":
    main()
