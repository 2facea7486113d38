"""Aggregation operators (SURVEY.md §2.4, A1-A11 analogs on driver tables).

The reference computes per-miner hash aggregates with conditional counts
(rpc.js:244-275), per-block rollups with nested commit lists
(rpc.js:463-487) and global sums (server.js:334-352). Here the same
aggregate shapes run over lineitem/orders/customer, expressed so Catalyst
does map-side partial aggregation before the shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ._util import dec_sum, money, t


def a1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 analog (rpc.js:253-273): group + count + exact sums + conditional
    count, the per-miner stats shape. TPC-H Q1 skeleton."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") < "1998-09-01")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("n_items"),
            money(dec_sum("l_quantity")).alias("sum_qty"),
            money(dec_sum("l_extendedprice")).alias("sum_base_price"),
            money(
                dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4)
            ).alias("sum_disc_price"),
            F.sum(F.when(F.col("l_discount") > 0.05, 1).otherwise(0)).alias(
                "n_discounted"
            ),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def a3_conditional_wins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 analog (rpc.js:301-305): per-key win counts with a predicate
    split (canonical wins vs bonus-era wins)."""
    o = t(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(
            F.count("*").alias("total_orders"),
            F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)).alias(
                "finished_orders"
            ),
            F.sum(
                F.when(
                    (F.col("o_orderstatus") == "F")
                    & (F.col("o_orderpriority") == "1-URGENT"),
                    1,
                ).otherwise(0)
            ).alias("urgent_finished_orders"),
        )
        .filter(F.col("total_orders") >= 3)
        .orderBy("o_custkey")
    )


def a5_derived_scalars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 analog (rpc.js:433-434): post-aggregation arithmetic
    (average_burn = burned/mined; normalized = won/average)."""
    li = t(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_suppkey").agg(
        F.count("*").alias("n_items"),
        dec_sum("l_extendedprice").alias("_sum_price"),
        F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).alias(
            "n_returned"
        ),
    )
    return (
        agg.select(
            "l_suppkey",
            "n_items",
            money(F.col("_sum_price")).alias("sum_price"),
            money(F.col("_sum_price") / F.col("n_items"), 4).alias("avg_price"),
            money(
                F.col("n_returned") / (F.col("_sum_price") / F.col("n_items")), 6
            ).alias("normalized_returns"),
        )
        .orderBy("l_suppkey")
    )


def a6_order_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 analog (rpc.js:463-487): per-group sum + count + nested list
    (commit_value_list). The list is sorted for cross-engine determinism."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_orderkey")
        .agg(
            money(dec_sum("l_extendedprice")).alias("sum_price"),
            F.count("*").alias("n_items"),
            # CSV-serialized: driver canonicalizer can't hash array<> cols
            F.concat_ws(
                ",", F.sort_array(F.collect_list("l_partkey"))
            ).alias("part_list"),
        )
        .filter(F.col("n_items") >= 5)
        .orderBy("l_orderkey")
    )


def a7_group_count_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7 analog (rpc.js:324-336): two-level aggregate — per-group counts,
    then a global Σ(count−1) (the reference's exclude-coinbase count)."""
    li = t(spark, sf_dir, "lineitem")
    per_order = li.groupBy("l_orderkey").agg(F.count("*").alias("n"))
    return per_order.agg(
        F.sum(F.col("n") - 1).alias("tx_count"),
        F.count("*").alias("n_groups"),
    )


def a8_global_scaled_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8 analog (server.js:334-352): global sum, unit-scaled (/1e8),
    rounded to 2dp."""
    li = t(spark, sf_dir, "lineitem")
    return li.agg(
        money(dec_sum("l_extendedprice") / F.lit(100000000)).alias("btc_total")
    )


def a10_range_restricted_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10 analog (server.js:304-331): the A1 pipeline re-run under a
    range filter (trailing-window recompute as a parameterized view).
    The between-predicate pushes down to the parquet scan."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate").between("1996-01-01", "1996-12-31"))
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n_items"),
            money(dec_sum("l_extendedprice")).alias("sum_price"),
        )
        .orderBy("l_returnflag")
    )


def a12_distinct_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension (SURVEY §2.4 note): exact distinct aggregate + ROLLUP
    grouping sets — absent from the reference, free in Spark/DuckDB."""
    o = t(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.countDistinct("o_custkey").alias("n_customers"),
            money(dec_sum("o_totalprice")).alias("sum_total"),
        )
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


def a18_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary GROUPING SETS (beyond a12's rollup lattice): the
    status marginal, the priority marginal, and the grand total in ONE
    pass — one shuffle feeding all three groupings, vs three scans if
    expressed as a UNION of aggregates. grouping() flags disambiguate
    a NULL group key from a rolled-up one. Spark 4 DataFrame
    groupingSets API."""
    o = t(spark, sf_dir, "orders")
    return (
        o.groupingSets(
            [["o_orderstatus"], ["o_orderpriority"], []],
            "o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping("o_orderstatus").cast("int").alias("g_status"),
            F.grouping("o_orderpriority").cast("int").alias("g_priority"),
            F.count("*").alias("n_orders"),
            money(dec_sum("o_totalprice")).alias("sum_total"),
        )
        .orderBy(
            "g_status", "g_priority",
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


def a14_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension (SURVEY §2.4 note): exact interpolated percentiles
    per group — Spark `percentile` and DuckDB `quantile_cont` share
    linear-interpolation semantics, so even quartiles of doubles
    hash-match. (The approximate sketch variants are engine-specific
    and deliberately not oracle-gated.)"""
    li = t(spark, sf_dir, "lineitem")
    q = li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_extendedprice, array(0.25, 0.5, 0.75))")
        .alias("qs"),
        F.count("*").alias("n"),
    )
    return q.select(
        "l_returnflag", "n",
        F.round(F.col("qs")[0], 4).alias("p25"),
        F.round(F.col("qs")[1], 4).alias("p50"),
        F.round(F.col("qs")[2], 4).alias("p75"),
    ).orderBy("l_returnflag")


def a15_salted_group_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-mitigated aggregation (SURVEY §4 / operators/skew.py):
    lineitem grouped by l_returnflag — 3 values, so every key is a hot
    key. two_stage_agg salts the partial aggregate 16 ways (spreading
    each key's merge across reducers), then merges the tiny partials;
    the result is row-identical to the plain GROUP BY the oracle runs."""
    from ..operators.skew import two_stage_agg

    li = t(spark, sf_dir, "lineitem")
    out = two_stage_agg(
        li.withColumn("_p", F.col("l_extendedprice").cast("decimal(18,2)"))
          .withColumn("_q", F.col("l_quantity").cast("decimal(18,2)")),
        key="l_returnflag", salt_from="l_orderkey", buckets=16,
        partial_aggs=[
            F.count("*").alias("_n"),
            F.sum("_q").alias("_sq"),
            F.sum("_p").alias("_sp"),
        ],
        final_aggs=[
            F.sum("_n").alias("n_items"),
            F.sum("_sq").alias("_sum_qty"),
            F.sum("_sp").alias("_sum_price"),
        ],
    )
    return out.select(
        "l_returnflag", "n_items",
        money(F.col("_sum_qty")).alias("sum_qty"),
        money(F.col("_sum_price")).alias("sum_price"),
    ).orderBy("l_returnflag")


def a16_approx_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based approximate aggregates (SURVEY §2.4 note: absent
    from the reference; the 100-TB substitutes for exact distinct/
    percentile when the exact forms are too shuffle-heavy):
    HyperLogLog++ distinct counts and approx_percentile per group.

    Raw sketch values are engine-specific (DuckDB's approx_distinct is
    a different HLL), so the CHECKABLE surface is (a) exact companion
    aggregates and (b) bounds verdicts computed Spark-side as exact
    integer comparisons: distinct_ok pins |HLL − exact| <= 5% (the
    rsd=0.02 sketch at 2.5 sigma), and p50/p99_rank_ok pin that the
    approximate percentile's exact RANK lands within +-5%/- +-0.5% of
    the target quantile (count of rows at-or-below / strictly-below
    the sketch value — rank is the engine-neutral way to judge a
    percentile). The DuckDB oracle replays the exact columns and the
    expected TRUE verdicts, so a sketch drifting out of bounds turns
    this row red. Two scans: one agg pass, then a broadcast of the
    O(groups) bounds back over orders for the exact rank counts."""
    o = t(spark, sf_dir, "orders")
    g = o.groupBy("o_orderstatus").agg(
        F.count("*").cast("long").alias("n_orders"),
        F.countDistinct("o_custkey").cast("long").alias("exact_customers"),
        F.approx_count_distinct("o_custkey", rsd=0.02).alias("_ad"),
        F.expr("approx_percentile(o_totalprice, array(0.5, 0.99))")
        .alias("_pp"),
    )
    bounds = g.select("o_orderstatus", F.col("_pp")[0].alias("_p50"),
                      F.col("_pp")[1].alias("_p99"))
    pr = F.col("o_totalprice")
    ranks = (
        o.join(F.broadcast(bounds), "o_orderstatus")
        .groupBy("o_orderstatus")
        .agg(
            F.sum((pr <= F.col("_p50")).cast("long")).alias("le50"),
            F.sum((pr < F.col("_p50")).cast("long")).alias("lt50"),
            F.sum((pr <= F.col("_p99")).cast("long")).alias("le99"),
            F.sum((pr < F.col("_p99")).cast("long")).alias("lt99"),
        )
    )
    n = F.col("n_orders")
    return (
        g.join(ranks, "o_orderstatus")
        .select(
            "o_orderstatus", "n_orders", "exact_customers",
            (F.abs(F.col("_ad") - F.col("exact_customers")) * 100
             <= F.col("exact_customers") * 5).alias("distinct_ok"),
            ((F.col("le50") * 100 >= n * 45)
             & (F.col("lt50") * 100 <= n * 55)).alias("p50_rank_ok"),
            ((F.col("le99") * 1000 >= n * 985)
             & (F.col("lt99") * 1000 <= n * 995)).alias("p99_rank_ok"),
        )
        .orderBy("o_orderstatus")
    )


_HIST_STEP = 25_000
_HIST_TOP = 19


def a19_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of order totals: bucket index by integer
    division, clamped into [0, 19] so the tail lands in one overflow
    bin. One map-side-combinable hash aggregate — the binning column is
    pure arithmetic, so at scale this is a single shuffle of at most
    20 rows per map task (the classic distributed-histogram shape;
    floor/least on IEEE doubles is bit-identical across engines)."""
    o = t(spark, sf_dir, "orders")
    bucket = F.least(
        F.floor(F.col("o_totalprice") / _HIST_STEP), F.lit(_HIST_TOP)
    ).cast("long")
    return (
        o.select(bucket.alias("bucket"), "o_totalprice")
        .groupBy("bucket")
        .agg(F.count("*").alias("n_orders"),
             money(dec_sum("o_totalprice")).alias("sum_price"))
        .withColumn("lo_edge",
                    (F.col("bucket") * _HIST_STEP).cast("double"))
        .select("bucket", "lo_edge", "n_orders", "sum_price")
        .orderBy("bucket")
    )


QUERIES = {
    "a19_histogram": a19_histogram,
    "a1_pricing_summary": a1_pricing_summary,
    "a14_percentiles": a14_percentiles,
    "a15_salted_group_agg": a15_salted_group_agg,
    "a16_approx_stats": a16_approx_stats,
    "a3_conditional_wins": a3_conditional_wins,
    "a5_derived_scalars": a5_derived_scalars,
    "a6_order_rollup": a6_order_rollup,
    "a7_group_count_sum": a7_group_count_sum,
    "a8_global_scaled_sum": a8_global_scaled_sum,
    "a10_range_restricted_stats": a10_range_restricted_stats,
    "a12_distinct_rollup": a12_distinct_rollup,
    "a18_grouping_sets": a18_grouping_sets,
}

ORACLES = {
    # a16: the sketch values themselves are engine-specific, so the
    # oracle replays the exact companions and the EXPECTED verdicts —
    # a Spark sketch drifting out of its published bound flips a
    # boolean and the hash goes red.
    "a16_approx_stats": """
        SELECT o_orderstatus,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(count(DISTINCT o_custkey) AS BIGINT)
                   AS exact_customers,
               TRUE AS distinct_ok,
               TRUE AS p50_rank_ok,
               TRUE AS p99_rank_ok
        FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    "a19_histogram": f"""
        SELECT CAST(least(floor(o_totalprice / {_HIST_STEP}), {_HIST_TOP})
                    AS BIGINT) AS bucket,
               CAST(least(floor(o_totalprice / {_HIST_STEP}), {_HIST_TOP})
                    * {_HIST_STEP} AS DOUBLE) AS lo_edge,
               count(*) AS n_orders,
               CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2)
                    AS DOUBLE) AS sum_price
        FROM orders
        GROUP BY 1, 2 ORDER BY bucket
    """,
    "a15_salted_group_agg": """
        SELECT l_returnflag, count(*) AS n_items,
               CAST(round(sum(CAST(l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_qty,
               CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_price
        FROM lineitem GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
    "a14_percentiles": """
        SELECT l_returnflag, count(*) AS n,
               round(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
               round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
               round(quantile_cont(l_extendedprice, 0.75), 4) AS p75
        FROM lineitem GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
    "a1_pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               count(*) AS n_items,
               CAST(round(sum(CAST(l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_qty,
               CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_base_price,
               CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_disc_price,
               CAST(sum(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END) AS BIGINT) AS n_discounted
        FROM lineitem
        WHERE l_shipdate < TIMESTAMP '1998-09-01'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    "a3_conditional_wins": """
        SELECT o_custkey,
               count(*) AS total_orders,
               CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS finished_orders,
               CAST(sum(CASE WHEN o_orderstatus = 'F' AND o_orderpriority = '1-URGENT'
                        THEN 1 ELSE 0 END) AS BIGINT) AS urgent_finished_orders
        FROM orders
        GROUP BY o_custkey
        HAVING count(*) >= 3
        ORDER BY o_custkey
    """,
    "a5_derived_scalars": """
        WITH agg AS (
            SELECT l_suppkey,
                   count(*) AS n_items,
                   sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS _sum_price,
                   sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS n_returned
            FROM lineitem GROUP BY l_suppkey
        )
        SELECT l_suppkey, n_items,
               CAST(round(_sum_price, 2) AS DOUBLE) AS sum_price,
               CAST(round(_sum_price / n_items, 4) AS DOUBLE) AS avg_price,
               CAST(round(n_returned / (_sum_price / n_items), 6) AS DOUBLE) AS normalized_returns
        FROM agg ORDER BY l_suppkey
    """,
    "a6_order_rollup": """
        SELECT l_orderkey,
               CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_price,
               count(*) AS n_items,
               array_to_string(list_sort(list(l_partkey)), ',') AS part_list
        FROM lineitem
        GROUP BY l_orderkey
        HAVING count(*) >= 5
        ORDER BY l_orderkey
    """,
    "a7_group_count_sum": """
        WITH per_order AS (
            SELECT l_orderkey, count(*) AS n FROM lineitem GROUP BY l_orderkey
        )
        SELECT CAST(sum(n - 1) AS BIGINT) AS tx_count, count(*) AS n_groups FROM per_order
    """,
    "a8_global_scaled_sum": """
        SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))) / 100000000, 2) AS DOUBLE) AS btc_total
        FROM lineitem
    """,
    "a10_range_restricted_stats": """
        SELECT l_returnflag,
               count(*) AS n_items,
               CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_price
        FROM lineitem
        WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1996-12-31'
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
    "a18_grouping_sets": """
        SELECT o_orderstatus, o_orderpriority,
               CAST(grouping(o_orderstatus) AS INT) AS g_status,
               CAST(grouping(o_orderpriority) AS INT) AS g_priority,
               count(*) AS n_orders,
               CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2)
                    AS DOUBLE) AS sum_total
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY g_status, g_priority, o_orderstatus, o_orderpriority
    """,
    "a12_distinct_rollup": """
        SELECT o_orderstatus, o_orderpriority,
               count(*) AS n_orders,
               count(DISTINCT o_custkey) AS n_customers,
               CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_total
        FROM orders
        GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
    """,
}


def a20_scalable_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact rank-based median + p90 of order value per market segment
    via a VALUE HISTOGRAM — the scale path for a14_percentiles.

    a14 sorts every row inside its group (fine per-group, but the sort
    is O(rows)); here the cumulative scan runs over the DISTINCT-value
    table (groupBy(seg, price) first, map-side combinable), so the
    window sees O(|value domain|) rows per segment no matter how many
    orders exist — at 100 TB the 2-decimal price domain is ~1e7 values
    while the fact table is ~1e12 rows. Rank statistics (value at
    ceil(n/2) / ceil(0.9n)) rather than interpolation: the output is a
    value that exists in the data, exact in any engine."""
    from pyspark.sql import Window

    o = t(spark, sf_dir, "orders").select(
        "o_custkey", F.col("o_totalprice").alias("price"))
    c = t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"),
        F.col("c_mktsegment").alias("seg"))
    j = o.join(F.broadcast(c), "o_custkey")
    counts = j.groupBy("seg", "price").agg(F.count("*").alias("cnt"))
    w = (Window.partitionBy("seg").orderBy("price")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum = counts.withColumn("cum", F.sum("cnt").over(w))
    tot = counts.groupBy("seg").agg(F.sum("cnt").alias("n_orders"))
    joined = cum.join(F.broadcast(tot), "seg")
    med = (joined.filter(F.expr("cum >= (n_orders + 1) div 2"))
           .groupBy("seg").agg(F.min("price").alias("median_price")))
    p90 = (joined.filter(F.expr("cum >= (9 * n_orders + 9) div 10"))
           .groupBy("seg").agg(F.min("price").alias("p90_price")))
    return (tot.join(med, "seg").join(p90, "seg")
            .select("seg", "n_orders", "median_price", "p90_price")
            .orderBy("seg"))


QUERIES["a20_scalable_median"] = a20_scalable_median

ORACLES["a20_scalable_median"] = """
    WITH j AS (
        SELECT c.c_mktsegment AS seg, o.o_totalprice AS price
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ), counts AS (
        SELECT seg, price, count(*) AS cnt FROM j GROUP BY seg, price
    ), cum AS (
        SELECT seg, price, cnt,
               sum(cnt) OVER (PARTITION BY seg ORDER BY price
                              ROWS UNBOUNDED PRECEDING) AS cum
        FROM counts
    ), tot AS (
        SELECT seg, CAST(sum(cnt) AS BIGINT) AS n_orders
        FROM counts GROUP BY seg
    ), med AS (
        SELECT cum.seg, min(price) AS median_price
        FROM cum JOIN tot ON cum.seg = tot.seg
        WHERE cum >= (n_orders + 1) // 2 GROUP BY cum.seg
    ), p90 AS (
        SELECT cum.seg, min(price) AS p90_price
        FROM cum JOIN tot ON cum.seg = tot.seg
        WHERE cum >= (9 * n_orders + 9) // 10 GROUP BY cum.seg
    )
    SELECT tot.seg, n_orders, median_price, p90_price
    FROM tot JOIN med ON tot.seg = med.seg JOIN p90 ON tot.seg = p90.seg
    ORDER BY tot.seg
"""


def a21_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic HyperLogLog distinct-count of orders.o_custkey
    (operators/sketches.py): every register derives from md5, so the
    harmonic sum is an exact int64 and the estimate a single IEEE
    division — the whole *approximate* sketch is value-hash checkable
    against DuckDB, unlike approx_count_distinct (a16, whose gate
    checks exact companions + bounds verdicts instead).

    Scale: one map-side pass, a 256-key shuffle, one broadcast — the
    distinct-count plan for a 10^12-row key column with no
    O(distinct) shuffle. exact_distinct rides along for error audit
    only (drop it at fleet scale)."""
    from ..operators import sketches as SK

    return SK.hll_distinct(t(spark, sf_dir, "orders"), "o_custkey")


QUERIES["a21_hll_distinct"] = a21_hll_distinct


def _hll_oracle() -> str:
    from ..operators.sketches import (
        HLL_M_LOG2, HLL_RHO_HEX, HLL_RHO_MAX, hll_alpha_numerator)

    m = 1 << HLL_M_LOG2
    top = HLL_RHO_MAX - 1
    d1 = "(strpos('0123456789abcdef', substring(hh, 1, 1)) - 1)"
    d2 = "(strpos('0123456789abcdef', substring(hh, 2, 1)) - 1)"
    return f"""
    WITH h AS (
        SELECT md5(CAST(o_custkey AS VARCHAR)) AS hh, o_custkey FROM orders
    ), b AS (
        SELECT (({d1}) * 16 + ({d2})) % {m} AS bucket,
               ltrim(substring(hh, 3, {HLL_RHO_HEX}), '0') AS lt
        FROM h
    ), r AS (
        SELECT bucket,
               CASE WHEN lt = '' THEN {HLL_RHO_MAX}
                    ELSE 4 * ({HLL_RHO_HEX} - length(lt))
                         + CASE WHEN substring(lt, 1, 1) = '1' THEN 3
                                WHEN substring(lt, 1, 1) IN ('2', '3') THEN 2
                                WHEN substring(lt, 1, 1) IN ('4', '5', '6', '7') THEN 1
                                ELSE 0 END + 1 END AS rho
        FROM b
    ), regs AS (
        SELECT bucket, max(rho) AS register FROM r GROUP BY bucket
    ), agg AS (
        SELECT count(*) AS np,
               CAST(sum(CAST(1 AS BIGINT) << ({top} - register)) AS BIGINT) AS sp
        FROM regs
    ), ex AS (
        SELECT count(DISTINCT o_custkey) AS exact_distinct FROM orders
    )
    SELECT CAST({m} AS BIGINT) AS m,
           CAST({m} - np AS BIGINT) AS v_zero,
           CAST(sp + ({m} - np) * (CAST(1 AS BIGINT) << {top}) AS BIGINT)
               AS harmonic_scaled,
           {hll_alpha_numerator()!r}
               / CAST(sp + ({m} - np) * (CAST(1 AS BIGINT) << {top}) AS DOUBLE)
               AS hll_estimate,
           exact_distinct
    FROM agg, ex
"""


ORACLES["a21_hll_distinct"] = _hll_oracle()


def a22_mode_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact mode (most frequent event_type) per user with
    deterministic lexicographic tie-break — the categorical-imputation
    statistic. Scale shape: ONE combinable groupBy(user, type)
    collapses the events to its value domain before the per-user
    argmax window ranks O(types) rows per user."""
    ev = t(spark, sf_dir, "events")
    counts = ev.groupBy("user_id", "event_type").agg(
        F.count("*").alias("cnt"))
    w = Window.partitionBy("user_id").orderBy(
        F.desc("cnt"), F.asc("event_type"))
    return (
        counts.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1).drop("_rk")
        .select("user_id",
                F.col("event_type").alias("mode_event_type"),
                F.col("cnt").cast("long").alias("mode_count"))
        .orderBy("user_id")
    )


QUERIES["a22_mode_per_group"] = a22_mode_per_group

ORACLES["a22_mode_per_group"] = """
    WITH c AS (
        SELECT user_id, event_type, count(*) AS cnt
        FROM events GROUP BY 1, 2
    ), r AS (
        SELECT user_id, event_type, cnt,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY cnt DESC, event_type) AS rk
        FROM c
    )
    SELECT user_id, event_type AS mode_event_type,
           CAST(cnt AS BIGINT) AS mode_count
    FROM r WHERE rk = 1 ORDER BY user_id
"""


def a23_exact_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation of quantity vs extended price per return
    flag, computed from EXACT integer-cent sums (Sx, Sy, Sxx, Syy,
    Sxy as decimal(38,0)) with the final r assembled in a fixed IEEE
    op order — bit-identical across engines where a built-in corr()
    (one streaming pass, order-dependent float accumulation) is not.
    One combinable groupBy; the moment sums are the map-side combine."""
    li = t(spark, sf_dir, "lineitem")
    x = (F.col("l_quantity").cast("decimal(18,2)") * 100) \
        .cast("decimal(38,0)")
    y = (F.col("l_extendedprice").cast("decimal(18,2)") * 100) \
        .cast("decimal(38,0)")
    s = li.groupBy("l_returnflag").agg(
        F.count("*").cast("decimal(38,0)").alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum((x * y).cast("decimal(38,0)")).alias("sxy"),
        F.sum((x * x).cast("decimal(38,0)")).alias("sxx"),
        F.sum((y * y).cast("decimal(38,0)")).alias("syy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) \
        .cast("double")
    dx = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")) \
        .cast("double")
    dy = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")) \
        .cast("double")
    return s.select(
        F.col("l_returnflag").alias("flag"),
        F.col("n").cast("long").alias("n"),
        (num / (F.sqrt(dx) * F.sqrt(dy))).alias("corr_qty_price"),
    ).orderBy("flag")


QUERIES["a23_exact_corr"] = a23_exact_corr

ORACLES["a23_exact_corr"] = """
    WITH c AS (
        SELECT l_returnflag AS flag,
               CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100
                    AS DECIMAL(38,0)) AS x,
               CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                    AS DECIMAL(38,0)) AS y
        FROM lineitem
    ), s AS (
        SELECT flag, CAST(count(*) AS DECIMAL(38,0)) AS n,
               CAST(sum(x) AS DECIMAL(38,0)) AS sx,
               CAST(sum(y) AS DECIMAL(38,0)) AS sy,
               CAST(sum(CAST(x * y AS DECIMAL(38,0)))
                    AS DECIMAL(38,0)) AS sxy,
               CAST(sum(CAST(x * x AS DECIMAL(38,0)))
                    AS DECIMAL(38,0)) AS sxx,
               CAST(sum(CAST(y * y AS DECIMAL(38,0)))
                    AS DECIMAL(38,0)) AS syy
        FROM c GROUP BY flag
    )
    SELECT flag, CAST(n AS BIGINT) AS n,
           CAST(n * sxy - sx * sy AS DOUBLE)
               / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                  * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))
               AS corr_qty_price
    FROM s ORDER BY flag
"""


def a25_hll_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch algebra, demonstrated and hash-checked: HLL
    registers built independently per lang partition then MERGED by
    per-bucket max must equal the registers built over the whole
    corpus in one pass — the property that lets 1000 executors (or
    1000 days of partitions) sketch independently and combine without
    rescanning. Emits both harmonic sums, the merged estimate, and
    merge_exact = 1 pinned by the value hash."""
    from ..operators import sketches as SK

    m = 1 << SK.HLL_M_LOG2
    top = SK.HLL_RHO_MAX - 1
    docs = t(spark, sf_dir, "documents")
    h = F.md5(F.col("text"))
    base = docs.select(
        "lang",
        (F.conv(F.substring(h, 1, 2), 16, 10).cast("bigint") % m)
        .alias("bucket"),
        F.substring(h, 3, SK.HLL_RHO_HEX).alias("_rh"),
    ).withColumn("rho", SK._rho("_rh"))

    def harmonic(regs: DataFrame, out: str) -> DataFrame:
        return regs.agg(
            F.count("*").alias("_np"),
            F.sum(F.expr(
                f"shiftleft(CAST(1 AS BIGINT), {top} - register)"))
            .alias("_sp"),
        ).select(
            (F.col("_sp") + (F.lit(m) - F.col("_np"))
             * F.lit(1 << top).cast("bigint")).alias(out))

    per = base.groupBy("lang", "bucket").agg(F.max("rho").alias("reg"))
    merged = per.groupBy("bucket").agg(F.max("reg").alias("register"))
    glob = base.groupBy("bucket").agg(F.max("rho").alias("register"))
    hm = harmonic(merged, "harmonic_merged")
    hg = harmonic(glob, "harmonic_global")
    numer = SK.hll_alpha_numerator()
    return (
        hm.crossJoin(F.broadcast(hg))
        .select(
            F.lit(m).cast("long").alias("m"),
            "harmonic_merged", "harmonic_global",
            (F.col("harmonic_merged") == F.col("harmonic_global"))
            .cast("int").alias("merge_exact"),
            (F.lit(numer) / F.col("harmonic_merged").cast("double"))
            .alias("hll_estimate"),
        )
    )


QUERIES["a25_hll_merge"] = a25_hll_merge


def _hll_merge_oracle() -> str:
    from ..operators.sketches import (
        HLL_M_LOG2, HLL_RHO_HEX, HLL_RHO_MAX, hll_alpha_numerator)

    m = 1 << HLL_M_LOG2
    top = HLL_RHO_MAX - 1
    d1 = "(strpos('0123456789abcdef', substring(hh, 1, 1)) - 1)"
    d2 = "(strpos('0123456789abcdef', substring(hh, 2, 1)) - 1)"
    return f"""
    WITH h AS (
        SELECT lang, md5(text) AS hh FROM documents
    ), b AS (
        SELECT lang, (({d1}) * 16 + ({d2})) % {m} AS bucket,
               ltrim(substring(hh, 3, {HLL_RHO_HEX}), '0') AS lt
        FROM h
    ), r AS (
        SELECT lang, bucket,
               CASE WHEN lt = '' THEN {HLL_RHO_MAX}
                    ELSE 4 * ({HLL_RHO_HEX} - length(lt))
                         + CASE WHEN substring(lt, 1, 1) = '1' THEN 3
                                WHEN substring(lt, 1, 1) IN ('2', '3') THEN 2
                                WHEN substring(lt, 1, 1) IN ('4', '5', '6', '7') THEN 1
                                ELSE 0 END + 1 END AS rho
        FROM b
    ), per AS (
        SELECT lang, bucket, max(rho) AS reg FROM r GROUP BY lang, bucket
    ), merged AS (
        SELECT bucket, max(reg) AS register FROM per GROUP BY bucket
    ), gall AS (
        SELECT bucket, max(rho) AS register FROM r GROUP BY bucket
    ), hm AS (
        SELECT CAST(sum(CAST(1 AS BIGINT) << ({top} - register))
                    + ({m} - count(*)) * (CAST(1 AS BIGINT) << {top})
                    AS BIGINT) AS harmonic_merged
        FROM merged
    ), hg AS (
        SELECT CAST(sum(CAST(1 AS BIGINT) << ({top} - register))
                    + ({m} - count(*)) * (CAST(1 AS BIGINT) << {top})
                    AS BIGINT) AS harmonic_global
        FROM gall
    )
    SELECT CAST({m} AS BIGINT) AS m, harmonic_merged, harmonic_global,
           CAST(CASE WHEN harmonic_merged = harmonic_global
                     THEN 1 ELSE 0 END AS INTEGER) AS merge_exact,
           {hll_alpha_numerator()!r} / CAST(harmonic_merged AS DOUBLE)
               AS hll_estimate
    FROM hm, hg
"""


ORACLES["a25_hll_merge"] = _hll_merge_oracle()


def a26_mergeable_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable moments sketch with an in-query merge proof (the a25
    pattern applied to variance): per event_type, the (n, Σx, Σx²)
    statistic is computed TWICE — once globally, once as two partial
    sketches (event_id parity halves, standing in for two ingest
    shards) merged by component-wise addition — and the output pins
    both the moment values and merge_ok, the claim that makes
    distributed/incremental variance sound: moments form a commutative
    monoid, so partial aggregation over any sharding is exact. All
    sums accumulate in DECIMAL(38,0) (Spark) / HUGEINT (the oracle)
    — never int64, which would silently wrap — and `moments_safe`
    pins, exactly, that |Σx|, Σx² and n all fit int64 (which also
    proves the decimal(38,0) products below never exceed 38 digits:
    each factor < 2^63 ≈ 9.3e18, so products < 8.6e37 and the
    subtraction of two non-negatives stays within ±8.6e37). When the
    bound fails the int64-cast output columns are NULL on BOTH
    engines, flagged instead of silently wrong (the w23 lane_safe
    discipline applied to moments)."""
    ev = t(spark, sf_dir, "events")
    i64max = F.lit(9223372036854775807).cast("decimal(38,0)")
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("bigint")
    base = ev.select("event_type", (F.col("event_id") % 2).alias("half"),
                     cents.alias("c"),
                     cents.cast("decimal(19,0)").alias("cd"))
    parts = base.groupBy("event_type", "half").agg(
        F.count("*").alias("pn"), F.sum("cd").alias("ps1"),
        F.sum((F.col("cd") * F.col("cd")).cast("decimal(38,0)"))
        .alias("ps2"))
    merged = parts.groupBy("event_type").agg(
        F.sum("pn").alias("mn"),
        F.sum(F.col("ps1").cast("decimal(38,0)")).alias("ms1"),
        F.sum("ps2").alias("ms2"))
    direct = base.groupBy("event_type").agg(
        F.count("*").cast("decimal(38,0)").alias("dn"),
        F.sum("cd").cast("decimal(38,0)").alias("ds1"),
        F.sum((F.col("cd") * F.col("cd")).cast("decimal(38,0)"))
        .alias("ds2"))
    safe = ((F.abs(F.col("ds1")) <= i64max)
            & (F.col("ds2") <= i64max) & (F.col("dn") <= i64max))
    var_dec = (F.col("dn") * F.col("ds2")
               - F.col("ds1") * F.col("ds1")).cast("decimal(38,0)")
    return (
        direct.join(merged, "event_type")
        .select(
            "event_type",
            F.col("dn").cast("long").alias("n"),
            F.when(safe, F.col("ds1").cast("long")).alias("sum_cents"),
            F.when(safe, F.col("ds2").cast("long")).alias("sum_sq_cents"),
            F.when(safe, var_dec.cast("long")).alias("var_num"),
            ((F.col("mn").cast("decimal(38,0)") == F.col("dn"))
             & (F.col("ms1").cast("decimal(38,0)") == F.col("ds1"))
             & (F.col("ms2") == F.col("ds2"))).alias("merge_ok"),
            safe.alias("moments_safe"),
        )
        .orderBy("event_type")
    )


QUERIES["a26_mergeable_moments"] = a26_mergeable_moments

ORACLES["a26_mergeable_moments"] = """
    WITH base AS (
        SELECT event_type, event_id % 2 AS half,
               CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
        FROM events
    ), parts AS (
        SELECT event_type, half, count(*) AS pn,
               sum(CAST(c AS HUGEINT)) AS ps1,
               sum(CAST(c AS HUGEINT) * c) AS ps2
        FROM base GROUP BY event_type, half
    ), merged AS (
        SELECT event_type, sum(pn) AS mn, sum(ps1) AS ms1,
               sum(ps2) AS ms2
        FROM parts GROUP BY event_type
    ), direct AS (
        SELECT event_type, CAST(count(*) AS HUGEINT) AS n,
               sum(CAST(c AS HUGEINT)) AS s1,
               sum(CAST(c AS HUGEINT) * c) AS s2
        FROM base GROUP BY event_type
    ), guarded AS (
        SELECT *, (abs(s1) <= 9223372036854775807
                   AND s2 <= 9223372036854775807
                   AND n <= 9223372036854775807) AS ok
        FROM direct
    )
    SELECT d.event_type, CAST(d.n AS BIGINT) AS n,
           CASE WHEN ok THEN CAST(d.s1 AS BIGINT) END AS sum_cents,
           CASE WHEN ok THEN CAST(d.s2 AS BIGINT) END AS sum_sq_cents,
           CASE WHEN ok THEN CAST(d.n * d.s2 - d.s1 * d.s1 AS BIGINT)
                END AS var_num,
           (m.mn = d.n AND m.ms1 = d.s1 AND m.ms2 = d.s2) AS merge_ok,
           ok AS moments_safe
    FROM guarded d JOIN merged m ON d.event_type = m.event_type
    ORDER BY d.event_type
"""


def a27_gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus concentration report: the Gini coefficient of token mass
    across sources — the one-number answer to "is this dataset
    dominated by a few sources?" that a mixture-design review reads
    next to dp9's composition table. Exact integer Gini: with masses
    x_1<=...<=x_n (rank window over the O(sources) rollup — bounded,
    never data-sized), G = (2*Σi·x_i − (n+1)*Σx) / (n*Σx); numerator
    and denominator surface as exact int64 and the ratio is ONE float
    division (dp9/w18 single-op rule)."""
    from ..operators.text import tokens

    docs = t(spark, sf_dir, "documents")
    mass = (docs
            .select("source", F.size(tokens(F.col("text"))).alias("nt"))
            .groupBy("source").agg(F.sum("nt").cast("bigint").alias("m")))
    w = Window.orderBy("m", "source")
    ranked = mass.withColumn("i", F.row_number().over(w).cast("bigint"))
    return ranked.agg(
        F.count("*").cast("long").alias("n_sources"),
        F.sum("m").cast("long").alias("total_tokens"),
        (F.sum(F.col("i") * F.col("m") * 2)
         - (F.count("*") + 1) * F.sum("m")).cast("long").alias("gini_num"),
        (F.count("*") * F.sum("m")).cast("long").alias("gini_den"),
        ((F.sum(F.col("i") * F.col("m") * 2)
          - (F.count("*") + 1) * F.sum("m")).cast("double")
         / (F.count("*") * F.sum("m")).cast("double")).alias("gini"),
    )


QUERIES["a27_gini_concentration"] = a27_gini_concentration

ORACLES["a27_gini_concentration"] = """
    WITH mass AS (
        SELECT source,
               CAST(sum(len(string_split(
                   trim(regexp_replace(lower(text), '\\s+', ' ', 'g')),
                   ' '))) AS BIGINT) AS m
        FROM documents GROUP BY source
    ), ranked AS (
        SELECT m, CAST(row_number() OVER (ORDER BY m, source)
                       AS BIGINT) AS i
        FROM mass
    )
    SELECT CAST(count(*) AS BIGINT) AS n_sources,
           CAST(sum(m) AS BIGINT) AS total_tokens,
           CAST(sum(i * m * 2) - (count(*) + 1) * sum(m)
                AS BIGINT) AS gini_num,
           CAST(count(*) * sum(m) AS BIGINT) AS gini_den,
           CAST(sum(i * m * 2) - (count(*) + 1) * sum(m) AS DOUBLE)
               / CAST(count(*) * sum(m) AS DOUBLE) AS gini
    FROM ranked
"""


A28_QS = (50, 90, 99)


def a28_ddsketch_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DDSketch-style quantiles that are ENGINE-EXACT (the a21/tx13
    move applied to quantile sketches): order totals in integer cents
    drop into dyadic sub-buckets — bucket lower bound =
    (c div 2^(bits-3)) * 2^(bits-3), keeping the top 3 bits, an
    integer-only histogram with relative error <= 12.5%. Bit positions
    come from length(bin(c)), never float log2 (wrong at power-of-2
    boundaries). The quantile estimate is the lower bound of the
    bucket holding the ceil(q*n/100)-th rank; exact-rank companions
    and a rel_err_ok verdict (|est-exact|*8 <= exact) prove the error
    contract instead of assuming it. Every step integer, so the
    sketch VALUES hash-check against DuckDB.

    Scale: the mergeable sketch is a groupBy over O(buckets) keys
    (map-side combinable, ~30 sub-buckets per decade of domain); only
    the exact-rank AUDIT column uses the distinct-value cumulative
    window (the a20 exact-median engine) — at fleet scale you ship
    the sketch and drop the audit."""
    o = t(spark, sf_dir, "orders")
    cents = (F.col("o_totalprice").cast("decimal(18,2)") * 100) \
        .cast("bigint")
    base = o.select(cents.alias("c")).filter(F.col("c") > 0)
    scale = F.expr("CAST(pow(2, length(bin(c)) - 3) AS BIGINT)")
    keyed = base.select(
        (F.col("c") - F.pmod(F.col("c"), scale)).alias("blo"))
    sketch = keyed.groupBy("blo").agg(F.count("*").alias("bn"))
    wb = Window.orderBy("blo").rowsBetween(
        Window.unboundedPreceding, Window.currentRow)
    cum = sketch.withColumn("cumn", F.sum("bn").over(wb)) \
        .withColumn("n", F.sum("bn").over(
            Window.rowsBetween(Window.unboundedPreceding,
                               Window.unboundedFollowing)))
    # exact-rank audit: cumulative counts over DISTINCT cents values
    # (O(value domain), the a20 engine), never a row-level sort
    vals = base.groupBy("c").agg(F.count("*").alias("vn"))
    wv = Window.orderBy("c").rowsBetween(
        Window.unboundedPreceding, Window.currentRow)
    vcum = vals.withColumn("vcumn", F.sum("vn").over(wv))
    qs = spark.createDataFrame([(q,) for q in A28_QS], "q_pct int")
    ranked = qs.crossJoin(
        F.broadcast(cum.select("n").limit(1)))
    ranked = ranked.withColumn(
        "r", F.expr("CAST((q_pct * n + 99) div 100 AS BIGINT)"))
    est = (
        ranked.join(F.broadcast(cum.select("blo", "cumn")),
                    F.col("cumn") >= F.col("r"))
        .groupBy("q_pct", "n", "r")
        .agg(F.min("blo").alias("est_cents"))
    )
    exact = (
        ranked.join(F.broadcast(vcum), F.col("vcumn") >= F.col("r"))
        .groupBy("q_pct")
        .agg(F.min("c").alias("exact_cents"))
    )
    return (
        est.join(exact, "q_pct")
        .select(
            "q_pct", F.col("n").cast("long").alias("n"),
            F.col("est_cents").cast("long").alias("est_cents"),
            F.col("exact_cents").cast("long").alias("exact_cents"),
            (F.abs(F.col("est_cents") - F.col("exact_cents")) * 8
             <= F.col("exact_cents")).alias("rel_err_ok"),
        )
        .orderBy("q_pct")
    )


QUERIES["a28_ddsketch_quantiles"] = a28_ddsketch_quantiles

ORACLES["a28_ddsketch_quantiles"] = """
    WITH base AS (
        SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
               AS c
        FROM orders
        WHERE o_totalprice > 0
    ), keyed AS (
        SELECT c,
               c - c % CAST(2 ** (length(bin(c)) - 3) AS BIGINT) AS blo
        FROM base
    ), sketch AS (
        SELECT blo, CAST(count(*) AS BIGINT) AS bn
        FROM keyed GROUP BY blo
    ), cum AS (
        SELECT blo, bn,
               sum(bn) OVER (ORDER BY blo
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cumn,
               sum(bn) OVER () AS n
        FROM sketch
    ), vals AS (
        SELECT c, count(*) AS vn FROM keyed GROUP BY c
    ), vcum AS (
        SELECT c,
               sum(vn) OVER (ORDER BY c
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS vcumn
        FROM vals
    ), qs AS (
        SELECT unnest([50, 90, 99]) AS q_pct
    ), ranked AS (
        SELECT q_pct, n,
               CAST((q_pct * n + 99) // 100 AS BIGINT) AS r
        FROM qs CROSS JOIN (SELECT DISTINCT n FROM cum) t
    ), est AS (
        SELECT rk.q_pct, rk.n, rk.r,
               CAST(min(cu.blo) AS BIGINT) AS est_cents
        FROM ranked rk JOIN cum cu ON cu.cumn >= rk.r
        GROUP BY rk.q_pct, rk.n, rk.r
    ), ex AS (
        SELECT rk.q_pct, CAST(min(v.c) AS BIGINT) AS exact_cents
        FROM ranked rk JOIN vcum v ON v.vcumn >= rk.r
        GROUP BY rk.q_pct
    )
    SELECT e.q_pct, CAST(e.n AS BIGINT) AS n, e.est_cents,
           x.exact_cents,
           abs(e.est_cents - x.exact_cents) * 8 <= x.exact_cents
               AS rel_err_ok
    FROM est e JOIN ex x ON e.q_pct = x.q_pct
    ORDER BY e.q_pct
"""
