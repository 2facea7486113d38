"""Join operators (SURVEY.md §2.3, J1-J10 analogs on driver tables).

The reference hand-rolls hash joins with JS objects (rpc.js:80-84) and
fuses join+collect_list ("group-joins", rpc.js:185-241). Here every
variant is a declarative equi-join: Catalyst/AQE picks broadcast for
dimensions (region/nation/supplier) and sort-merge for fact-fact; at
100 TB the fact tables would be bucketed on the join keys so these run
shuffle-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ._util import dec_sum, money, t


def j1_equi_join_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1-J5 analog: five-table equi-join chain (the reference's five
    group-joins onto snapshots, rpc.js:185-241) + revenue aggregate.

    Join order is dimension-first: region/nation broadcast onto
    customer, that onto orders — so the one big shuffle (lineitem ⋈
    orders) sees an orders side already semi-reduced to the ASIA ~1/5.
    Catalyst can't derive this itself (the r_name filter only reaches
    orders through two joins), and at 100 TB it's the difference
    between shuffling all orders or a fifth of them."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region")
    c_asia = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .filter(F.col("r_name") == "ASIA")
        .select("c_custkey", "n_name")
    )
    o_asia = o.join(c_asia, o.o_custkey == c_asia.c_custkey).select(
        "o_orderkey", "n_name"
    )
    return (
        li.join(o_asia, li.l_orderkey == o_asia.o_orderkey)
        .groupBy("n_name")
        .agg(
            money(
                dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4)
            ).alias("revenue"),
            F.count("*").alias("n_items"),
        )
        .orderBy("n_name")
    )


def j2_group_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 group-join (rpc.js:196-205): join + collect_list fused — per
    customer, the sorted list of order keys (nested child-array model,
    SURVEY §1.1.3)."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .groupBy("c_custkey")
        .agg(
            F.count("*").alias("n_orders"),
            # serialized to CSV at the query boundary: the driver's
            # canonicalizer can't hash raw array<> columns
            F.concat_ws(
                ",", F.sort_array(F.collect_list("o_orderkey"))
            ).alias("order_list"),
        )
        .filter(F.col("n_orders") >= 5)
        .orderBy("c_custkey")
    )


def j6_composite_key_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6 (rpc.js:128-148): composite-key equi-join on
    (key_block_ptr, key_vtxindex) — here (l_partkey, l_suppkey) against
    a derived part-supp dimension.

    The fact table is pre-partitioned once on the composite key so the
    build aggregate, the join, and the final aggregate all reuse that
    one shuffle (2x faster than letting the planner broadcast the fact
    side locally, and the only shape that works when the fact side is
    too big to broadcast)."""
    li = t(spark, sf_dir, "lineitem").repartition("l_partkey", "l_suppkey")
    ps = (
        li.groupBy("l_partkey", "l_suppkey")
        .agg(F.count("*").alias("n_lines"),
             money(dec_sum("l_quantity")).alias("ps_qty"))
        .withColumnRenamed("l_partkey", "ps_partkey")
        .withColumnRenamed("l_suppkey", "ps_suppkey")
    )
    return (
        li.join(
            ps,
            (li.l_partkey == ps.ps_partkey) & (li.l_suppkey == ps.ps_suppkey),
        )
        .filter(F.col("n_lines") >= 3)
        .groupBy("ps_partkey", "ps_suppkey")
        .agg(
            F.count("*").alias("n_join_rows"),
            F.max("ps_qty").alias("ps_qty_max"),
        )
        .orderBy("ps_partkey", "ps_suppkey")
    )


def j7_winner_in_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J7 winner join (rpc.js:269): pick the 'winning' child row per
    group — the min-price lineitem per order, via join on
    (orderkey, min_extendedprice), tiebroken by min linenumber."""
    li = t(spark, sf_dir, "lineitem")
    mins = li.groupBy("l_orderkey").agg(
        F.min("l_extendedprice").alias("min_price")
    )
    return (
        li.join(
            mins,
            (li.l_orderkey == mins.l_orderkey)
            & (li.l_extendedprice == mins.min_price),
        )
        .drop(mins.l_orderkey)
        .groupBy("l_orderkey", "min_price")
        .agg(F.min("l_linenumber").alias("winner_linenumber"))
        .orderBy("l_orderkey")
    )


def j8_computed_key_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J8 (rpc.js:320-336): join on a computed key —
    md5(block_hash‖consensus_hash) in the reference; here
    md5(brand‖type) links part rows to a derived per-(brand,type) dim."""
    p = t(spark, sf_dir, "part")
    keyed = p.withColumn(
        "grp_key", F.md5(F.concat_ws("|", F.col("p_brand"), F.col("p_type")))
    )
    dim = keyed.groupBy("grp_key").agg(
        F.count("*").alias("n_in_group"),
        money(dec_sum("p_retailprice")).alias("group_price"),
    )
    return (
        keyed.join(dim, "grp_key")
        .filter(F.col("n_in_group") >= 5)
        .select("p_partkey", "grp_key", "n_in_group", "group_price")
        .orderBy("p_partkey")
    )


def j10_scalar_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J10 (server.js:162-171): every row × broadcast scalar params
    (price feed + gas constant) — the RR-enrichment cross join."""
    s = t(spark, sf_dir, "supplier")
    li = t(spark, sf_dir, "lineitem")
    params = spark.createDataFrame(
        [(65000.0, 0.55, 35000.0)], "btc_price double, stx_price double, gas double"
    )
    stats = li.groupBy("l_suppkey").agg(
        F.count("*").alias("n_items"),
        dec_sum("l_extendedprice").alias("_burned"),
    )
    return (
        stats.join(s, stats.l_suppkey == s.s_suppkey)
        .crossJoin(F.broadcast(params))
        .select(
            "s_suppkey",
            "s_name",
            "n_items",
            money(F.col("_burned")).alias("burned"),
            # exact decimal product, then one IEEE double division — both
            # engines produce the identical bit pattern (round(double, n)
            # does not: Spark HALF_UPs the decimal expansion, DuckDB
            # rounds the binary double)
            (
                (
                    F.col("n_items").cast("decimal(18,0)")
                    * F.col("gas").cast("decimal(18,0)")
                    + F.col("_burned")
                )
                * F.col("btc_price").cast("decimal(18,0)")
            )
            .cast("double")
            .__div__(F.lit(100000000.0))
            .alias("cost_btc"),
        )
        .orderBy("s_suppkey")
    )


def j11_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-join (EXISTS) — absent from the reference (§2.3 note), part
    of the rebuilt surface: customers having at least one urgent order."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT")
    return (
        c.join(urgent, c.c_custkey == urgent.o_custkey, "left_semi")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    )


def j12_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-join (NOT EXISTS): customers with no orders at all."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_name", "c_acctbal")
        .orderBy("c_custkey")
    )


def j13_left_outer_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-outer join preserving empty groups (customer order counts
    including zero) — the reference's nested empty child arrays
    (rpc.js:166-170) re-expressed."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
        .orderBy("c_custkey")
    )


def _priority_chain_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parent-pointer forest derived from orders: five chains (one per
    o_orderpriority, linked by ascending orderkey)."""
    from pyspark.sql import Window
    from ..schemas import ZERO64

    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    w = Window.partitionBy("o_orderpriority").orderBy("o_orderkey")
    return o.select(
        F.col("o_orderkey").cast("string").alias("id"),
        F.coalesce(
            F.lag(F.col("o_orderkey").cast("string")).over(w), F.lit(ZERO64)
        ).alias("parent"),
        "o_orderpriority",
    )


def j9_chain_walk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J9/O-R1/O-R2 (rpc.js:277-309): the canonical-chain walk on a
    parent-pointer forest, via chain.chain_members (pointer-doubling —
    O(log n) joins, SURVEY §4).

    The walk anchors at the globally max orderkey's tip and must
    return exactly its priority's chain. The DuckDB oracle walks the
    same edges with WITH RECURSIVE."""
    from ..chain import chain_members

    edges = _priority_chain_edges(spark, sf_dir)
    tip = (
        edges.orderBy(F.col("id").cast("long").desc()).limit(1).select("id")
    )
    members = chain_members(edges, tip, "id", "parent")
    return (
        edges.join(members, "id")
        .select(F.col("id").cast("long").alias("o_orderkey"),
                "o_orderpriority")
        .orderBy("o_orderkey")
    )


def j16_recursive_cte_walk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The chain walk through Spark 4's native WITH RECURSIVE
    (chain.chain_members_rcte) — the declarative SQL twin of the
    DuckDB oracle, level-for-level. Parity surface for SQL users; the
    pointer-doubling/segmented walks stay the scale paths (the
    recursion runs one join PER CHAIN LINK, so the forest here chains
    each customer's orders — depth ~=orders/customer, which stays
    constant as the data scales, unlike j9's per-priority chains)."""
    from pyspark.sql import Window
    from ..chain import chain_members_rcte
    from ..schemas import ZERO64

    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
    edges = o.select(
        F.col("o_orderkey").cast("string").alias("id"),
        F.coalesce(
            F.lag(F.col("o_orderkey").cast("string")).over(w), F.lit(ZERO64)
        ).alias("parent"),
        "o_custkey",
    )
    tip_id = edges.orderBy(F.col("id").cast("long").desc()) \
        .limit(1).collect()[0].id
    members = chain_members_rcte(edges, tip_id, "id", "parent")
    return (
        edges.join(members, "id")
        .select(F.col("id").cast("long").alias("o_orderkey"), "o_custkey")
        .orderBy("o_orderkey")
    )


def j14_band_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Band (range) join — absent from the reference AND from Spark's
    native join strategies (§2.3 taxonomy note): every (purchase,
    error) pair of the same user within ±4 h. Bucketed plan
    (operators/rangejoin.py): equi shuffle on (user, time-bucket) with
    ≤3× fanout instead of a nested-loop cross product. The DuckDB
    oracle uses its native inequality (IE) join."""
    from ..operators.rangejoin import band_join

    ev = t(spark, sf_dir, "events")
    band_us = 4 * 3600 * 1_000_000
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.unix_micros("ts").alias("p_us"),
    )
    e = ev.filter(F.col("event_type") == "error").select(
        "user_id",
        F.col("event_id").alias("error_id"),
        F.unix_micros("ts").alias("e_us"),
    )
    return (
        band_join(p, e, ["user_id"], "p_us", "e_us", band_us)
        .select(
            "purchase_id", "error_id",
            (F.col("e_us") - F.col("p_us")).alias("delta_us"),
        )
        .orderBy("purchase_id", "error_id")
    )


def j15_interval_overlap_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join: signup windows (1 h) × click windows
    (30 min) of the same user that overlap. Both sides fan out to the
    time buckets their interval touches; each match is kept only in
    the first shared bucket, so no dedup shuffle is needed
    (operators/rangejoin.py)."""
    from ..operators.rangejoin import interval_overlap_join

    ev = t(spark, sf_dir, "events")
    hour_us = 3600 * 1_000_000
    s = ev.filter(F.col("event_type") == "signup").select(
        "user_id",
        F.col("event_id").alias("signup_id"),
        F.unix_micros("ts").alias("s_lo"),
        (F.unix_micros("ts") + hour_us).alias("s_hi"),
    )
    c = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("event_id").alias("click_id"),
        F.unix_micros("ts").alias("c_lo"),
        (F.unix_micros("ts") + hour_us // 2).alias("c_hi"),
    )
    return (
        interval_overlap_join(
            s, c, ["user_id"], "s_lo", "s_hi", "c_lo", "c_hi",
            bucket_us=hour_us)
        .select("signup_id", "click_id",
                (F.least("s_hi", "c_hi")
                 - F.greatest("s_lo", "c_lo")).alias("overlap_us"))
        .orderBy("signup_id", "click_id")
    )


_BLOOM_M = 256   # filter bits
_BLOOM_W = 32    # bits per mask word (avoids the sign bit in both engines)


def _bloom_positions(col: F.Column) -> list[F.Column]:
    """Two bit positions in [0, M) from independent 32-bit segments of
    md5(key) — the same portable hex->int trick the dedup oracles use."""
    h = F.md5(col.cast("string"))
    return [
        F.pmod(
            F.conv(F.substring(h, 1 + 8 * i, 8), 16, 10).cast("bigint"),
            F.lit(_BLOOM_M))
        for i in range(2)
    ]


def j17_bloom_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter runtime-pruned semi-join: build a tiny bitmap over
    the dimension keys (suppliers in every 5th nation), broadcast it,
    and test the fact side (lineitem) against it BEFORE the real join —
    the explicit form of Spark's runtime row-level filtering
    (spark.sql.optimizer.runtime.bloomFilter.enabled) and of the
    reference's build-then-probe hash joins (rpc.js:80-84).

    At 100 TB this is the pattern that saves the shuffle: the bitmap is
    O(bits) regardless of fact size, ships to every executor, and drops
    non-matching fact rows at the scan, so only ~selectivity x fact
    rows reach the join shuffle. Output checks the contract: zero
    false negatives, and the measured false-positive rate.
    """
    li = t(spark, sf_dir, "lineitem")
    keys = (t(spark, sf_dir, "supplier")
            .filter(F.col("s_nationkey") % 5 == 0).select("s_suppkey"))

    kp = keys.select(
        F.explode(F.array(*_bloom_positions(F.col("s_suppkey")))).alias("p"))
    words = (
        kp.select(
            (F.col("p") / _BLOOM_W).cast("long").alias("w"),
            F.expr(f"shiftleft(CAST(1 AS BIGINT), "
                   f"CAST(p % {_BLOOM_W} AS INT))").alias("bit"))
        .groupBy("w").agg(F.bit_or("bit").alias("mask"))
    )

    p1, p2 = _bloom_positions(F.col("l_suppkey"))
    probe = (
        li.select(F.col("l_suppkey"), p1.alias("p1"), p2.alias("p2"))
        .withColumn("w1", (F.col("p1") / _BLOOM_W).cast("long"))
        .withColumn("w2", (F.col("p2") / _BLOOM_W).cast("long"))
    )
    tested = (
        probe
        .join(F.broadcast(words.select(F.col("w").alias("w1"),
                                       F.col("mask").alias("m1"))),
              "w1", "left")
        .join(F.broadcast(words.select(F.col("w").alias("w2"),
                                       F.col("mask").alias("m2"))),
              "w2", "left")
        .withColumn("m1", F.coalesce("m1", F.lit(0).cast("bigint")))
        .withColumn("m2", F.coalesce("m2", F.lit(0).cast("bigint")))
    )
    bit = (f"shiftright(m{{i}}, CAST(p{{i}} % {_BLOOM_W} AS INT)) & 1 = 1")
    passed = F.expr(bit.format(i=1)) & F.expr(bit.format(i=2))
    flagged = (
        tested
        .join(F.broadcast(keys.select(F.col("s_suppkey").alias("k"))),
              F.col("l_suppkey") == F.col("k"), "left")
        .select(passed.alias("pass"), F.col("k").isNotNull().alias("member"))
    )
    one = lambda c: F.sum(F.when(c, 1).otherwise(0)).cast("long")  # noqa: E731
    agg = flagged.agg(
        F.count("*").alias("n_probed"),
        one(F.col("pass")).alias("bloom_passes"),
        one(F.col("member")).alias("true_matches"),
        one(F.col("member") & ~F.col("pass")).alias("false_negatives"),
        one(F.col("pass") & ~F.col("member")).alias("_fp"),
    )
    # fp_rate = HALF_UP(fp/nonmembers, 4dp) in exact bigint arithmetic
    # (the w12 lesson: rounding a double quotient near a .00005 tie
    # goes opposite ways in Spark and DuckDB). Zero-nonmember guard:
    # Spark's non-ANSI div-by-0 yields NULL while DuckDB errors —
    # define fp_rate = 0.0 when every probe is a member (no false
    # positive is possible), identically on both sides.
    return agg.select(
        "n_probed", "bloom_passes", "true_matches", "false_negatives",
        F.expr(
            "CASE WHEN n_probed = true_matches THEN CAST(0 AS BIGINT) "
            "ELSE (2 * _fp * 10000 + (n_probed - true_matches)) "
            "div (2 * (n_probed - true_matches)) END"
        ).cast("double").alias("_fp_scaled"),
    ).select(
        "n_probed", "bloom_passes", "true_matches", "false_negatives",
        (F.col("_fp_scaled") / F.lit(10_000.0)).alias("fp_rate"),
    )


QUERIES = {
    "j17_bloom_prune": j17_bloom_prune,
    "j1_equi_join_chain": j1_equi_join_chain,
    "j9_chain_walk": j9_chain_walk,
    "j2_group_join": j2_group_join,
    "j6_composite_key_join": j6_composite_key_join,
    "j7_winner_in_group": j7_winner_in_group,
    "j8_computed_key_join": j8_computed_key_join,
    "j10_scalar_enrichment": j10_scalar_enrichment,
    "j11_semi_join": j11_semi_join,
    "j12_anti_join": j12_anti_join,
    "j13_left_outer_count": j13_left_outer_count,
    "j14_band_join": j14_band_join,
    "j15_interval_overlap_join": j15_interval_overlap_join,
    "j16_recursive_cte_walk": j16_recursive_cte_walk,
}

def _hex_val_sql(pos: int) -> str:
    """DuckDB: int value of md5 hex chars [pos, pos+8) of column h."""
    digit = "(strpos('0123456789abcdef', substring(h, {p}, 1)) - 1)"
    return " + ".join(
        digit.format(p=pos + j) + f" * {16 ** (7 - j)}" for j in range(8))


def _bloom_sql() -> str:
    m, w = _BLOOM_M, _BLOOM_W
    seg = [f"CAST({_hex_val_sql(1)} AS BIGINT) % {m}",
           f"CAST({_hex_val_sql(9)} AS BIGINT) % {m}"]
    return f"""
        WITH keys AS (
            SELECT s_suppkey FROM supplier WHERE s_nationkey % 5 = 0
        ), kh AS (
            SELECT md5(CAST(s_suppkey AS VARCHAR)) AS h FROM keys
        ), kp AS (
            SELECT unnest([{seg[0]}, {seg[1]}]) AS p FROM kh
        ), words AS (
            SELECT p // {w} AS w,
                   bit_or(1::BIGINT << CAST(p % {w} AS INT)) AS mask
            FROM kp GROUP BY p // {w}
        ), ph AS (
            SELECT l_suppkey, md5(CAST(l_suppkey AS VARCHAR)) AS h
            FROM lineitem
        ), probe AS (
            SELECT l_suppkey, {seg[0]} AS p1, {seg[1]} AS p2 FROM ph
        ), tested AS (
            SELECT l_suppkey, p1, p2,
                   coalesce(w1.mask, 0) AS m1, coalesce(w2.mask, 0) AS m2
            FROM probe
            LEFT JOIN words w1 ON p1 // {w} = w1.w
            LEFT JOIN words w2 ON p2 // {w} = w2.w
        ), flags AS (
            SELECT ((m1 >> CAST(p1 % {w} AS INT)) & 1 = 1)
                       AND ((m2 >> CAST(p2 % {w} AS INT)) & 1 = 1) AS pass,
                   l_suppkey IN (SELECT s_suppkey FROM keys) AS member
            FROM tested
        )
        SELECT CAST(count(*) AS BIGINT) AS n_probed,
               CAST(sum(CASE WHEN pass THEN 1 ELSE 0 END) AS BIGINT)
                   AS bloom_passes,
               CAST(sum(CASE WHEN member THEN 1 ELSE 0 END) AS BIGINT)
                   AS true_matches,
               CAST(sum(CASE WHEN member AND NOT pass THEN 1 ELSE 0 END)
                    AS BIGINT) AS false_negatives,
               -- exact bigint HALF_UP(fp/nonmembers, 4dp); counts are
               -- non-negative so // (trunc) == floor == div; fp_rate
               -- defined as 0.0 when every probe is a member (guards
               -- the divide-by-zero, mirrored in the Spark query)
               CAST(CASE
                    WHEN count(*) = sum(CASE WHEN member THEN 1 ELSE 0 END)
                    THEN 0
                    ELSE (2 * sum(CASE WHEN pass AND NOT member
                                       THEN 1 ELSE 0 END) * 10000
                          + (count(*)
                             - sum(CASE WHEN member THEN 1 ELSE 0 END)))
                         // (2 * (count(*)
                                  - sum(CASE WHEN member THEN 1 ELSE 0 END)))
                    END AS DOUBLE) / 10000.0 AS fp_rate
        FROM flags
    """


ORACLES = {
    "j17_bloom_prune": _bloom_sql(),
    "j14_band_join": """
        WITH p AS (
            SELECT user_id, event_id AS purchase_id,
                   epoch_us(CAST(ts AS TIMESTAMP)) AS p_us
            FROM events WHERE event_type = 'purchase'
        ), e AS (
            SELECT user_id, event_id AS error_id,
                   epoch_us(CAST(ts AS TIMESTAMP)) AS e_us
            FROM events WHERE event_type = 'error'
        )
        SELECT p.purchase_id, e.error_id, e.e_us - p.p_us AS delta_us
        FROM p JOIN e
          ON p.user_id = e.user_id
         AND e.e_us BETWEEN p.p_us - 14400000000 AND p.p_us + 14400000000
        ORDER BY p.purchase_id, e.error_id
    """,
    "j15_interval_overlap_join": """
        WITH s AS (
            SELECT user_id, event_id AS signup_id,
                   epoch_us(CAST(ts AS TIMESTAMP)) AS s_lo,
                   epoch_us(CAST(ts AS TIMESTAMP)) + 3600000000 AS s_hi
            FROM events WHERE event_type = 'signup'
        ), c AS (
            SELECT user_id, event_id AS click_id,
                   epoch_us(CAST(ts AS TIMESTAMP)) AS c_lo,
                   epoch_us(CAST(ts AS TIMESTAMP)) + 1800000000 AS c_hi
            FROM events WHERE event_type = 'click'
        )
        SELECT s.signup_id, c.click_id,
               least(s.s_hi, c.c_hi) - greatest(s.s_lo, c.c_lo) AS overlap_us
        FROM s JOIN c
          ON s.user_id = c.user_id
         AND s.s_lo <= c.c_hi AND c.c_lo <= s.s_hi
        ORDER BY s.signup_id, c.click_id
    """,
    "j16_recursive_cte_walk": """
        WITH RECURSIVE edges AS (
            SELECT CAST(o_orderkey AS VARCHAR) AS id,
                   coalesce(CAST(lag(o_orderkey) OVER (
                       PARTITION BY o_custkey ORDER BY o_orderkey
                   ) AS VARCHAR), repeat('0', 64)) AS parent,
                   o_custkey
            FROM orders
        ), walk AS (
            SELECT id, parent FROM edges
            WHERE CAST(id AS BIGINT) = (SELECT max(o_orderkey) FROM orders)
            UNION ALL
            SELECT e.id, e.parent
            FROM edges e JOIN walk w ON e.id = w.parent
        )
        SELECT CAST(walk.id AS BIGINT) AS o_orderkey, e.o_custkey
        FROM walk JOIN edges e ON walk.id = e.id
        ORDER BY o_orderkey
    """,
    "j9_chain_walk": """
        WITH RECURSIVE edges AS (
            SELECT CAST(o_orderkey AS VARCHAR) AS id,
                   coalesce(CAST(lag(o_orderkey) OVER (
                       PARTITION BY o_orderpriority ORDER BY o_orderkey
                   ) AS VARCHAR), repeat('0', 64)) AS parent,
                   o_orderpriority
            FROM orders
        ), walk AS (
            SELECT id, parent FROM edges
            WHERE CAST(id AS BIGINT) = (SELECT max(o_orderkey) FROM orders)
            UNION ALL
            SELECT e.id, e.parent
            FROM edges e JOIN walk w ON e.id = w.parent
        )
        SELECT CAST(walk.id AS BIGINT) AS o_orderkey, e.o_orderpriority
        FROM walk JOIN edges e ON walk.id = e.id
        ORDER BY o_orderkey
    """,
    "j1_equi_join_chain": """
        SELECT n_name,
               CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue,
               count(*) AS n_items
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
        GROUP BY n_name
        ORDER BY n_name
    """,
    "j2_group_join": """
        SELECT c_custkey,
               count(*) AS n_orders,
               array_to_string(list_sort(list(o_orderkey)), ',') AS order_list
        FROM customer JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey
        HAVING count(*) >= 5
        ORDER BY c_custkey
    """,
    "j6_composite_key_join": """
        WITH ps AS (
            SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
                   count(*) AS n_lines,
                   CAST(round(sum(CAST(l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE) AS ps_qty
            FROM lineitem GROUP BY l_partkey, l_suppkey
        )
        SELECT ps_partkey, ps_suppkey,
               count(*) AS n_join_rows,
               max(ps_qty) AS ps_qty_max
        FROM lineitem JOIN ps
          ON l_partkey = ps_partkey AND l_suppkey = ps_suppkey
        WHERE n_lines >= 3
        GROUP BY ps_partkey, ps_suppkey
        ORDER BY ps_partkey, ps_suppkey
    """,
    "j7_winner_in_group": """
        WITH mins AS (
            SELECT l_orderkey AS m_orderkey, min(l_extendedprice) AS min_price
            FROM lineitem GROUP BY l_orderkey
        )
        SELECT l_orderkey, min_price,
               min(l_linenumber) AS winner_linenumber
        FROM lineitem JOIN mins
          ON l_orderkey = m_orderkey AND l_extendedprice = min_price
        GROUP BY l_orderkey, min_price
        ORDER BY l_orderkey
    """,
    "j8_computed_key_join": """
        WITH keyed AS (
            SELECT p_partkey, p_retailprice,
                   md5(p_brand || '|' || p_type) AS grp_key
            FROM part
        ), dim AS (
            SELECT grp_key, count(*) AS n_in_group,
                   CAST(round(sum(CAST(p_retailprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS group_price
            FROM keyed GROUP BY grp_key
        )
        SELECT p_partkey, keyed.grp_key AS grp_key, n_in_group, group_price
        FROM keyed JOIN dim USING (grp_key)
        WHERE n_in_group >= 5
        ORDER BY p_partkey
    """,
    "j10_scalar_enrichment": """
        WITH stats AS (
            SELECT l_suppkey, count(*) AS n_items,
                   sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS _burned
            FROM lineitem GROUP BY l_suppkey
        ), params AS (
            SELECT 65000.0 AS btc_price, 0.55 AS stx_price, 35000.0 AS gas
        )
        SELECT s_suppkey, s_name, n_items,
               CAST(round(_burned, 2) AS DOUBLE) AS burned,
               CAST((CAST(n_items AS DECIMAL(18,0)) * CAST(gas AS DECIMAL(18,0)) + _burned)
                    * CAST(btc_price AS DECIMAL(18,0)) AS DOUBLE) / 100000000.0 AS cost_btc
        FROM stats
        JOIN supplier ON l_suppkey = s_suppkey
        CROSS JOIN params
        ORDER BY s_suppkey
    """,
    "j11_semi_join": """
        SELECT c_custkey, c_name, c_mktsegment
        FROM customer
        WHERE EXISTS (
            SELECT 1 FROM orders
            WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
        )
        ORDER BY c_custkey
    """,
    "j12_anti_join": """
        SELECT c_custkey, c_name, c_acctbal
        FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        ORDER BY c_custkey
    """,
    "j13_left_outer_count": """
        SELECT c_custkey, count(o_orderkey) AS n_orders
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey
        ORDER BY c_custkey
    """,
}


def j18_salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted equi-join on a pathologically skewed key
    (operators/skew.salted_join): lineitem joins a 3-row weight dim on
    l_returnflag — 3 key values over the whole fact table, the shape
    where a plain shuffled join sends ~N/3 rows to ONE reducer. The
    salt (xxhash64 of l_orderkey mod 8) splits each hot key 8 ways on
    the big side while the dim replicates 8x — row-identical to the
    plain join (property-tested), and here value-checked against the
    unsalted oracle. At 100 TB this is the fallback when the dim is
    too big to broadcast and AQE's skew splitting can't help (it only
    splits SORT-MERGE partitions, not a hash-partitioned aggregate
    feeding the join)."""
    from ..operators.skew import salted_join

    li = t(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("flag"),
        F.col("l_orderkey"),
        F.col("l_quantity").cast("decimal(18,2)").alias("qty"),
    )
    dim = spark.createDataFrame(
        [("A", 2), ("N", 3), ("R", 5)], "flag string, weight long")
    joined = salted_join(li, dim, "flag", buckets=8,
                         salt_from="l_orderkey")
    return (
        joined.groupBy("flag")
        .agg(
            F.count("*").alias("n"),
            money(F.sum(F.col("qty") * F.col("weight")))
            .alias("weighted_qty"),
        )
        .orderBy("flag")
    )


QUERIES["j18_salted_skew_join"] = j18_salted_skew_join

ORACLES["j18_salted_skew_join"] = """
    WITH dim AS (
        SELECT * FROM (VALUES ('A', 2), ('N', 3), ('R', 5))
            AS v(flag, weight)
    )
    SELECT l.l_returnflag AS flag, count(*) AS n,
           CAST(round(sum(CAST(l.l_quantity AS DECIMAL(18,2)) * d.weight),
                      2) AS DOUBLE) AS weighted_qty
    FROM lineitem l JOIN dim d ON l.l_returnflag = d.flag
    GROUP BY 1 ORDER BY flag
"""


def j19_null_safe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join semantics (<=>): planted NULL keys on both
    sides (every 50th customer's nation, every 7th nation id) must
    MATCH each other under eqNullSafe — the semantic corner where a
    plain equi-join silently drops rows (NULL = NULL is NULL). The
    report counts matches per join flavor; at scale <=> keys hash
    NULL to one partition, so a null-heavy key needs the j18 salt."""
    c = t(spark, sf_dir, "customer").select(
        "c_custkey",
        F.when(F.col("c_custkey") % 50 == 0, F.lit(None))
        .otherwise(F.col("c_nationkey")).cast("long").alias("nk"))
    n = t(spark, sf_dir, "nation").select(
        F.when(F.col("n_nationkey") % 7 == 0, F.lit(None))
        .otherwise(F.col("n_nationkey")).cast("long").alias("nk2"),
        "n_name")
    plain = c.join(n, c.nk == n.nk2).agg(
        F.count("*").cast("long").alias("n"))
    safe = c.join(n, c.nk.eqNullSafe(n.nk2)).agg(
        F.count("*").cast("long").alias("n"))
    return (
        plain.select(F.lit("plain_equi").alias("flavor"), "n")
        .unionByName(safe.select(F.lit("null_safe").alias("flavor"), "n"))
        .orderBy("flavor")
    )


QUERIES["j19_null_safe_join"] = j19_null_safe_join

ORACLES["j19_null_safe_join"] = """
    WITH c AS (
        SELECT c_custkey,
               CASE WHEN c_custkey % 50 = 0 THEN NULL
                    ELSE c_nationkey END AS nk
        FROM customer
    ), n AS (
        SELECT CASE WHEN n_nationkey % 7 = 0 THEN NULL
                    ELSE n_nationkey END AS nk2, n_name
        FROM nation
    )
    SELECT 'null_safe' AS flavor, CAST(count(*) AS BIGINT) AS n
    FROM c JOIN n ON c.nk IS NOT DISTINCT FROM n.nk2
    UNION ALL
    SELECT 'plain_equi', count(*) FROM c JOIN n ON c.nk = n.nk2
    ORDER BY flavor
"""


def _j20_bucketed_tables(spark: SparkSession, sf_dir: str) \
        -> tuple[str, str]:
    """Build-once bucketed layout for the j20 fact-fact join — the
    third persisted-layout lifecycle beside the ANN index (sim19) and
    the LSH index (dd15): orders and lineitem are each written ONCE as
    bucketed tables on the join key with the same bucket count
    (io.write_bucketed), and every later join on that key runs with NO
    shuffle exchange — at 100 TB this converts the biggest recurring
    shuffle in the warehouse into a one-time layout cost. Rebuilds
    only when the catalog lacks the tables (per-process path + table
    names, so concurrent sweeps never race on one location; the
    catalog check makes repeat queries in a session free)."""
    import hashlib
    import os

    src = os.path.join(sf_dir, "lineitem.parquet")
    st = os.stat(src)
    fp = hashlib.sha256(
        f"{src}|{st.st_size}|{st.st_mtime_ns}".encode()).hexdigest()[:12]
    ot = f"sg_j20_orders_pid{os.getpid()}_{fp}"
    lt = f"sg_j20_lineitem_pid{os.getpid()}_{fp}"
    if not (spark.catalog.tableExists(ot)
            and spark.catalog.tableExists(lt)):
        import shutil

        from ..io import write_bucketed

        root = "/tmp/sg_bucketed"
        # self-cleaning layout: the dir name carries the owner pid, so
        # a build can reap layouts whose process is gone (kill(pid, 0)
        # raising) without ever touching a live sweep's tables
        if os.path.isdir(root):
            for d in os.listdir(root):
                if not d.startswith("pid"):
                    continue
                try:
                    pid = int(d[3:].split("_", 1)[0])
                    os.kill(pid, 0)
                except ValueError:
                    continue
                except ProcessLookupError:
                    # ESRCH: pid is gone — safe to reap. EPERM
                    # (PermissionError) means the pid is ALIVE under
                    # another user, so it must NOT be treated as dead.
                    shutil.rmtree(os.path.join(root, d),
                                  ignore_errors=True)
                except OSError:
                    continue
        base = f"{root}/pid{os.getpid()}_{fp}"
        write_bucketed(
            t(spark, sf_dir, "orders")
            .select("o_orderkey", "o_orderpriority"),
            ot, "o_orderkey", 8, path=f"{base}/orders")
        write_bucketed(
            t(spark, sf_dir, "lineitem")
            .select("l_orderkey", "l_extendedprice", "l_discount"),
            lt, "l_orderkey", 8, path=f"{base}/lineitem")
    return ot, lt


def j20_bucketed_colocated_join(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """Shuffle-free fact-fact join over a BUCKETED layout: orders and
    lineitem are bucketed on the join key with the same bucket count
    (built once per corpus, _j20_bucketed_tables), so the sort-merge
    join reads co-located buckets directly — the ONLY exchange in the
    whole plan is the O(groups) aggregate shuffle, pinned in
    tests/test_plans.py. The merge hint forces the SMJ so the
    demonstration doesn't silently degrade to a broadcast at test
    scale (at 100 TB neither side broadcasts). Revenue per order
    priority, j1's exact-decimal money discipline."""
    ot, lt = _j20_bucketed_tables(spark, sf_dir)
    o = spark.table(ot)
    li = spark.table(lt)
    return (
        li.join(o.hint("merge"), li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            money(
                dec_sum(F.col("l_extendedprice")
                        * (1 - F.col("l_discount")), 4)
            ).alias("revenue"),
            F.count("*").alias("n_items"),
        )
        .orderBy("o_orderpriority")
    )


QUERIES["j20_bucketed_colocated_join"] = j20_bucketed_colocated_join

ORACLES["j20_bucketed_colocated_join"] = """
    SELECT o_orderpriority,
           CAST(round(sum(CAST(l_extendedprice * (1 - l_discount)
                               AS DECIMAL(18,4))), 2) AS DOUBLE)
               AS revenue,
           count(*) AS n_items
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
"""
