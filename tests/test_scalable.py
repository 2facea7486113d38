"""Scalable global-window operators vs the single-partition reference
implementation: results must be identical; the big-data window must be
shard-partitioned (the whole point)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from mining_data_integration_spark.operators.scalable import (
    global_cumsum,
    global_lag,
    global_rank,
    global_row_number,
)
from mining_data_integration_spark.plans import formatted_plan


@pytest.fixture(scope="module")
def data(spark):
    rng = random.Random(7)
    # duplicate values + unique key k; amounts exact at 2 decimals
    rows = [(i, rng.randrange(0, 40), rng.randrange(0, 10_000) / 100)
            for i in range(2000)]
    return spark.createDataFrame(
        rows, "k long, grp long, amount double"
    ).withColumn("amt", F.col("amount").cast("decimal(18,2)"))


ORDERINGS = [                             # built lazily: Column exprs
    lambda: [F.col("k")],                 # need an active SparkContext
    lambda: [F.desc("k")],
    lambda: [F.col("grp"), F.desc("k")],  # dup leading key + tiebreak
]


@pytest.mark.parametrize("n_shards", [1, 3, 8])
@pytest.mark.parametrize("order_ix", range(len(ORDERINGS)))
class TestEquivalence:
    def test_row_number(self, data, n_shards, order_ix):
        order = ORDERINGS[order_ix]()
        got = global_row_number(
            data, order, num_partitions=n_shards
        ).select("k", "rn")
        ref = data.select(
            "k", F.row_number().over(Window.orderBy(*order))
            .cast("long").alias("rn"))
        assert got.exceptAll(ref).isEmpty() and ref.exceptAll(got).isEmpty()

    def test_cumsum(self, data, n_shards, order_ix):
        order = ORDERINGS[order_ix]()
        got = global_cumsum(
            data, order, F.col("amt"), out_col="c", num_partitions=n_shards
        ).select("k", "c")
        w = Window.orderBy(*order).rowsBetween(
            Window.unboundedPreceding, Window.currentRow)
        ref = data.select("k", F.sum("amt").over(w).alias("c"))
        assert got.exceptAll(ref).isEmpty() and ref.exceptAll(got).isEmpty()

    def test_lag(self, data, n_shards, order_ix):
        order = ORDERINGS[order_ix]()
        got = global_lag(
            data, order, F.col("amt"), out_col="p", num_partitions=n_shards
        ).select("k", "p")
        ref = data.select(
            "k", F.lag("amt").over(Window.orderBy(*order)).alias("p"))
        assert got.exceptAll(ref).isEmpty() and ref.exceptAll(got).isEmpty()


@pytest.mark.parametrize("n_shards", [1, 3, 8])
def test_rank_with_ties(data, n_shards):
    """rank/dense_rank over an order with HEAVY ties (grp has ~50 rows
    per value): the distinct-key engine must agree with Window.rank /
    Window.dense_rank exactly — tied rows share a rank, rank jumps by
    the tie count, dense_rank doesn't."""
    order = [F.desc("grp")]
    got = global_rank(
        data, order, rank_col="r", dense_col="d", num_partitions=n_shards
    ).select("k", "r", "d")
    w = Window.orderBy(F.desc("grp"))
    ref = data.select(
        "k",
        F.rank().over(w).cast("long").alias("r"),
        F.dense_rank().over(w).cast("long").alias("d"),
    )
    assert got.exceptAll(ref).isEmpty() and ref.exceptAll(got).isEmpty()


@pytest.mark.parametrize("n_shards", [1, 5])
@pytest.mark.parametrize("tiles", [3, 4, 7])
def test_rank_ntile_unique_order(data, n_shards, tiles):
    """ntile over a TOTAL order matches Window.ntile bit-for-bit (with
    ties Window.ntile is physically nondeterministic, so the contract
    is unique-key orderings — which is what every oracle query uses)."""
    order = [F.col("grp"), F.desc("k")]
    got = global_rank(
        data, order, ntile=tiles, ntile_col="t", num_partitions=n_shards
    ).select("k", "t")
    ref = data.select(
        "k", F.ntile(tiles).over(Window.orderBy(*order))
        .cast("long").alias("t"))
    assert got.exceptAll(ref).isEmpty() and ref.exceptAll(got).isEmpty()


def test_empty_and_single_row(spark):
    empty = spark.createDataFrame([], "k long, v decimal(18,2)")
    one = spark.createDataFrame([(1, 5.0)], "k long, v double") \
        .withColumn("v", F.col("v").cast("decimal(18,2)"))
    assert global_row_number(empty, [F.col("k")]).count() == 0
    row = global_lag(one, [F.col("k")], F.col("v"), "p").collect()[0]
    assert row.p is None
    row = global_cumsum(one, [F.col("k")], F.col("v"), "c").collect()[0]
    assert float(row.c) == 5.0


def test_big_window_is_sharded(data):
    """The data-bearing window must be partitioned by the shard id; the
    only unpartitioned window runs over the per-shard summary rows. The
    shard id must be a pure row expression — no spark_partition_id()
    (the round-2 dp5 lesson: partition ids after an exchange are an
    implicit planner contract, not a guarantee)."""
    plan = formatted_plan(
        global_row_number(data, [F.col("k")], num_partitions=8))
    assert "windowspecdefinition(_sc_pid" in plan
    assert "hashpartitioning(_sc_pid" in plan.lower()
    assert "spark_partition_id" not in plan.lower()


def test_plan_independent_across_session_confs(spark, data):
    """The dp5 regression pin: results must be bit-identical under any
    shuffle-partition count and with AQE on or off — shard assignment
    is a function of row values, not of the physical plan."""
    order = [F.col("grp"), F.desc("k")]

    def run():
        out = global_cumsum(
            data, order, F.col("amt"), out_col="c").select("k", "c")
        return sorted((r.k, str(r.c)) for r in out.collect())

    keys = ("spark.sql.shuffle.partitions", "spark.sql.adaptive.enabled")
    saved = {k: spark.conf.get(k) for k in keys}
    base = run()
    try:
        for parts, aqe in (("7", "true"), ("200", "false"), ("3", "true")):
            spark.conf.set(keys[0], parts)
            spark.conf.set(keys[1], aqe)
            assert run() == base, f"diverged at partitions={parts} aqe={aqe}"
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)
