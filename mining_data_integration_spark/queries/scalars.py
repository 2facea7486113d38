"""Scalar functions (SURVEY.md §2.8): JSON extraction, casts/strings,
the rate-of-return formula, sentinel compares.

The crypto codecs (X1-X5) are not SQL-expressible — they live in
addresses.py with known-vector + property-test coverage; everything
here is oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ._util import dec_sum, money, t


def x7_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X7 (rpc.js:351-366): JSON document column → typed field → branch.
    The reference JSON.parses the `op` column and branches on which key
    exists; here the events.props JSON field is extracted, cast, and
    bucketed."""
    ev = t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.select(
            "event_type",
            k.alias("k"),
            F.when(k >= 50, F.lit("high")).otherwise(F.lit("low")).alias("k_band"),
        )
        .groupBy("event_type", "k_band")
        .agg(F.count("*").alias("n"), F.min("k").alias("k_min"),
             F.max("k").alias("k_max"))
        .orderBy("event_type", "k_band")
    )


def x8_string_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X8/X11 (rpc.js:250,415): casts and substring/concat projections —
    string→int parse, txid.substring(0,10)-style display truncation."""
    c = t(spark, sf_dir, "customer")
    return (
        c.select(
            "c_custkey",
            F.substring("c_name", 1, 10).alias("name_prefix"),
            F.length("c_name").cast("long").alias("name_len"),
            F.upper("c_mktsegment").alias("segment_upper"),
            F.concat_ws("#", F.col("c_mktsegment"),
                        F.col("c_custkey").cast("string")).alias("seg_key"),
            # round-trip cast: int → string → int (parseInt parity)
            F.col("c_custkey").cast("string").cast("bigint").alias("key_roundtrip"),
        )
        .orderBy("c_custkey")
    )


def x12_rate_of_return(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X12 (utils.js:1-11): RR = earn/cost − 1 with
    earn = bonus·2466·stx + (wins − bonus)·1000·stx,
    cost = (mined·gas + burned)·btc/1e8.
    Inputs from per-supplier aggregates; constants parameterized as in
    serving.py. Exact decimal numerators, one IEEE division."""
    li = t(spark, sf_dir, "lineitem")
    stx, btc, gas = 0.55, 65000.0, 35000.0
    stats = li.groupBy("l_suppkey").agg(
        F.count("*").alias("mined"),
        dec_sum("l_extendedprice").alias("_burned"),
        F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).alias("wins"),
        F.sum(
            F.when(
                (F.col("l_returnflag") == "R") & (F.col("l_linenumber") == 1), 1
            ).otherwise(0)
        ).alias("bonus_wins"),
    )
    stx_milli = F.lit(int(stx * 1000)).cast("decimal(18,0)")
    earn = (
        F.col("bonus_wins").cast("decimal(18,0)") * F.lit(2466) * stx_milli
        + (F.col("wins") - F.col("bonus_wins")).cast("decimal(18,0)")
        * F.lit(1000) * stx_milli
    ).cast("double") / F.lit(1000.0)
    cost = (
        (
            F.col("mined").cast("decimal(18,0)") * F.lit(int(gas))
            + F.col("_burned")
        )
        * F.lit(int(btc))
    ).cast("double") / F.lit(100000000.0)
    return (
        stats.select(
            "l_suppkey",
            "mined",
            "wins",
            "bonus_wins",
            money(F.col("_burned")).alias("burned"),
            (earn / cost - F.lit(1.0)).alias("rr"),
        )
        .orderBy("l_suppkey")
    )


def x13_sentinel_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X13 (rpc.js:282,510): equality against a sentinel constant —
    the all-zeros hash that marks genesis/no-winner. Derived md5 keys
    with a sentinel-miss count."""
    p = t(spark, sf_dir, "part")
    zero64 = "0" * 32
    keyed = p.select(
        "p_partkey", F.md5(F.col("p_name")).alias("name_key")
    )
    return keyed.agg(
        F.sum(F.when(F.col("name_key") == zero64, 1).otherwise(0)).alias(
            "n_sentinel"
        ),
        F.count("*").alias("n_total"),
        F.min("name_key").alias("min_key"),
    )


def x14_higher_order_arrays(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X14 (mining_monitor_rpc.js:4-8): the reference's JS map/reduce
    over arrays, as Spark higher-order functions — collect a per-order
    quantity array, then aggregate() (fold), transform() (map) and
    filter() run JVM-side with no explode/re-group round trip. The
    same HOFs power the similarity operators' dot products."""
    li = t(spark, sf_dir, "lineitem")
    per_order = (
        li.filter(F.col("l_orderkey") <= 2000)
        .groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_list(
            F.col("l_quantity").cast("long"))).alias("qtys"))
    )
    return per_order.select(
        "l_orderkey",
        F.size("qtys").cast("long").alias("n_items"),
        F.aggregate("qtys", F.lit(0).cast("long"),
                    lambda acc, x: acc + x).alias("total_qty"),
        F.aggregate(F.transform("qtys", lambda x: x * x),
                    F.lit(0).cast("long"),
                    lambda acc, x: acc + x).alias("sum_sq"),
        F.size(F.filter("qtys", lambda x: x >= 25)).cast("long").alias("n_large"),
    ).orderBy("l_orderkey")


def a17_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (absent from the reference; the standard OLAP reshape):
    order counts and exact totals per priority, one column per order
    status. Spark pivot() with an explicit value list keeps the plan a
    single hash aggregate (no second pass to discover values)."""
    o = t(spark, sf_dir, "orders")
    pv = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(money(dec_sum("o_totalprice")))
    )
    return pv.select(
        "o_orderpriority",
        F.coalesce("F", F.lit(0.0)).alias("total_f"),
        F.coalesce("O", F.lit(0.0)).alias("total_o"),
        F.coalesce("P", F.lit(0.0)).alias("total_p"),
    ).orderBy("o_orderpriority")


_Z_BITS = 8


def x15_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton/Z-order clustering key over two bucketized dimensions
    (customer, order-date day) — the multi-dimensional data-layout key
    (operators/layout.py). Pure shift/mask integer arithmetic; the
    layout benefit (every file a bounded box in BOTH dims) is pinned
    in tests/test_layout.py."""
    from ..operators.layout import zorder_key

    o = t(spark, sf_dir, "orders")
    x = F.pmod(F.col("o_custkey"), F.lit(1 << _Z_BITS)).cast("bigint")
    y = F.pmod(
        F.datediff(F.col("o_orderdate"), F.lit("1992-01-01").cast("date")),
        F.lit(1 << _Z_BITS)).cast("bigint")
    return o.select(
        "o_orderkey",
        x.alias("xb"),
        y.alias("yb"),
        zorder_key(x, y, _Z_BITS).alias("zkey"),
    ).orderBy("o_orderkey")


def _z_sql(xe: str, ye: str, bits: int) -> str:
    terms = []
    for i in range(bits):
        terms.append(f"(({xe}) // {2 ** i} % 2) * {4 ** i}")
        terms.append(f"(({ye}) // {2 ** i} % 2) * {2 * 4 ** i}")
    return " + ".join(terms)


QUERIES = {
    "x15_zorder_key": x15_zorder_key,
    "x7_json_extract": x7_json_extract,
    "x8_string_ops": x8_string_ops,
    "x12_rate_of_return": x12_rate_of_return,
    "x13_sentinel_filter": x13_sentinel_filter,
    "x14_higher_order_arrays": x14_higher_order_arrays,
    "a17_pivot": a17_pivot,
}

ORACLES = {
    "x15_zorder_key": f"""
        WITH b AS (
            SELECT o_orderkey,
                   o_custkey % {1 << _Z_BITS} AS xb,
                   datediff('day', DATE '1992-01-01', o_orderdate)
                       % {1 << _Z_BITS} AS yb
            FROM orders
        )
        SELECT o_orderkey, CAST(xb AS BIGINT) AS xb, CAST(yb AS BIGINT) AS yb,
               CAST({_z_sql('xb', 'yb', _Z_BITS)} AS BIGINT) AS zkey
        FROM b ORDER BY o_orderkey
    """,
    "x14_higher_order_arrays": """
        WITH per_order AS (
            SELECT l_orderkey,
                   list_sort(list(CAST(l_quantity AS BIGINT))) AS qtys
            FROM lineitem WHERE l_orderkey <= 2000
            GROUP BY l_orderkey
        )
        SELECT l_orderkey,
               len(qtys) AS n_items,
               CAST(list_sum(qtys) AS BIGINT) AS total_qty,
               CAST(list_sum(list_transform(qtys, x -> x * x)) AS BIGINT) AS sum_sq,
               len(list_filter(qtys, x -> x >= 25)) AS n_large
        FROM per_order ORDER BY l_orderkey
    """,
    "a17_pivot": """
        SELECT o_orderpriority,
               coalesce(CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                   FILTER (WHERE o_orderstatus = 'F'), 2) AS DOUBLE), 0.0) AS total_f,
               coalesce(CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                   FILTER (WHERE o_orderstatus = 'O'), 2) AS DOUBLE), 0.0) AS total_o,
               coalesce(CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                   FILTER (WHERE o_orderstatus = 'P'), 2) AS DOUBLE), 0.0) AS total_p
        FROM orders GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
    "x7_json_extract": """
        WITH typed AS (
            SELECT event_type,
                   CAST(json_extract_string(props, '$.k') AS INT) AS k
            FROM events
        )
        SELECT event_type,
               CASE WHEN k >= 50 THEN 'high' ELSE 'low' END AS k_band,
               count(*) AS n, min(k) AS k_min, max(k) AS k_max
        FROM typed
        GROUP BY event_type, CASE WHEN k >= 50 THEN 'high' ELSE 'low' END
        ORDER BY event_type, k_band
    """,
    "x8_string_ops": """
        SELECT c_custkey,
               substring(c_name, 1, 10) AS name_prefix,
               length(c_name) AS name_len,
               upper(c_mktsegment) AS segment_upper,
               c_mktsegment || '#' || CAST(c_custkey AS VARCHAR) AS seg_key,
               CAST(CAST(c_custkey AS VARCHAR) AS BIGINT) AS key_roundtrip
        FROM customer
        ORDER BY c_custkey
    """,
    "x12_rate_of_return": """
        WITH stats AS (
            SELECT l_suppkey,
                   count(*) AS mined,
                   sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS _burned,
                   CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS wins,
                   CAST(sum(CASE WHEN l_returnflag = 'R' AND l_linenumber = 1
                            THEN 1 ELSE 0 END) AS BIGINT) AS bonus_wins
            FROM lineitem GROUP BY l_suppkey
        )
        SELECT l_suppkey, mined, wins, bonus_wins,
               CAST(round(_burned, 2) AS DOUBLE) AS burned,
               (CAST(CAST(bonus_wins AS DECIMAL(18,0)) * 2466 * 550
                     + CAST(wins - bonus_wins AS DECIMAL(18,0)) * 1000 * 550
                     AS DOUBLE) / 1000.0)
               / (CAST((CAST(mined AS DECIMAL(18,0)) * 35000 + _burned) * 65000 AS DOUBLE)
                  / 100000000.0)
               - 1.0 AS rr
        FROM stats
        ORDER BY l_suppkey
    """,
    "x13_sentinel_filter": """
        WITH keyed AS (
            SELECT p_partkey, md5(p_name) AS name_key FROM part
        )
        SELECT CAST(sum(CASE WHEN name_key = repeat('0', 32) THEN 1 ELSE 0 END) AS BIGINT) AS n_sentinel,
               count(*) AS n_total,
               min(name_key) AS min_key
        FROM keyed
    """,
}


def x16_try_cast_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dirty-input ingestion semantics: numeric strings with planted
    corruption (every 7th value suffixed, every 11th emptied) go
    through try_cast — bad values become NULL and are COUNTED into a
    quarantine tally instead of failing the job (ANSI mode would
    throw; a silent cast would fabricate NULLs without audit). Spark
    try_cast and DuckDB TRY_CAST share semantics, so the per-band
    good/quarantined split hash-checks. Pure map-side projection +
    one combinable aggregate."""
    ev = t(spark, sf_dir, "events")
    raw = (
        F.when(F.col("event_id") % 11 == 0, F.lit(""))
        .when(F.col("event_id") % 7 == 0,
              F.concat(F.col("value").cast("string"), F.lit("x")))
        .otherwise(F.col("value").cast("string"))
    )
    parsed = ev.select(
        "event_type",
        raw.alias("raw"),
    ).select(
        "event_type",
        F.expr("try_cast(raw AS DOUBLE)").alias("v"),
    )
    return (
        parsed.groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.sum(F.when(F.col("v").isNull(), 1).otherwise(0))
            .cast("long").alias("n_quarantined"),
            F.sum(F.coalesce(F.col("v"), F.lit(0.0))
                  .cast("decimal(18,6)")).cast("double")
            .alias("good_total"),
        )
        .orderBy("event_type")
    )


QUERIES["x16_try_cast_quarantine"] = x16_try_cast_quarantine

ORACLES["x16_try_cast_quarantine"] = """
    WITH raw AS (
        SELECT event_type,
               CASE WHEN event_id % 11 = 0 THEN ''
                    WHEN event_id % 7 = 0
                        THEN CAST(value AS VARCHAR) || 'x'
                    ELSE CAST(value AS VARCHAR) END AS r
        FROM events
    ), parsed AS (
        SELECT event_type, TRY_CAST(r AS DOUBLE) AS v FROM raw
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_quarantined,
           CAST(sum(CAST(coalesce(v, 0.0) AS DECIMAL(18,6)))
                AS DOUBLE) AS good_total
    FROM parsed GROUP BY event_type ORDER BY event_type
"""


def x18_json_shred_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured shredding audit: parse the events.props JSON
    into a key->value map, explode to (key, value) pairs, and roll up
    per-key row counts + integer value stats — the schema-inference
    report run before promoting a JSON blob column to typed columns.
    Malformed payloads (simulated: every 11th event's JSON truncated
    mid-object) are NOT dropped: from_json's PERMISSIVE null flags
    them and they surface as a '_malformed' audit row, mirroring the
    x16 quarantine discipline. Map-side only — parse, explode and
    partial-agg all happen before the single combinable shuffle."""
    ev = t(spark, sf_dir, "events")
    raw = ev.select(
        "event_id",
        F.when(F.col("event_id") % 11 == 0, F.lit('{"k": '))
        .otherwise(F.col("props")).alias("r"),
    )
    parsed = raw.select(
        "event_id", F.from_json("r", "map<string,string>").alias("m"))
    kv = (
        parsed.filter(F.col("m").isNotNull())
        .select(F.explode("m").alias("key", "val"))
        .withColumn("v", F.col("val").try_cast("long"))
    )
    stats = kv.groupBy("key").agg(
        F.count("*").cast("long").alias("n_rows"),
        F.sum("v").cast("long").alias("sum_val"),
        F.min("v").cast("long").alias("min_val"),
        F.max("v").cast("long").alias("max_val"),
    )
    bad = parsed.filter(F.col("m").isNull()).agg(
        F.count("*").cast("long").alias("n_rows")).select(
        F.lit("_malformed").alias("key"), "n_rows",
        F.lit(None).cast("long").alias("sum_val"),
        F.lit(None).cast("long").alias("min_val"),
        F.lit(None).cast("long").alias("max_val"),
    )
    return stats.unionByName(bad).orderBy("key")


QUERIES["x18_json_shred_stats"] = x18_json_shred_stats

ORACLES["x18_json_shred_stats"] = """
    WITH raw AS (
        SELECT event_id,
               CASE WHEN event_id % 11 = 0 THEN '{"k": '
                    ELSE props END AS r
        FROM events
    ), kv AS (
        -- this DuckDB build ships json_keys but not the json_each
        -- table function; unnest(json_keys()) is the portable spelling
        -- guard INSIDE the expression: json_keys raises on malformed
        -- input even under a WHERE json_valid() (the lateral unnest
        -- evaluates first), so invalid rows degrade to '{}' = no keys
        SELECT k AS key,
               TRY_CAST(json_extract_string(raw.r, '$.' || k) AS BIGINT)
                   AS v
        FROM raw, unnest(json_keys(
            CASE WHEN json_valid(raw.r) AND json_type(raw.r) = 'OBJECT'
                 THEN raw.r ELSE '{}' END)) AS u(k)
    ), stats AS (
        SELECT key, CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(v) AS BIGINT) AS sum_val,
               CAST(min(v) AS BIGINT) AS min_val,
               CAST(max(v) AS BIGINT) AS max_val
        FROM kv GROUP BY key
        UNION ALL
        -- malformed == what Spark's from_json(map) nulls out: invalid
        -- JSON *or* valid non-object payloads ('null', '123', '[1]')
        SELECT '_malformed', CAST(count(*) AS BIGINT),
               NULL, NULL, NULL
        FROM raw WHERE CASE WHEN NOT json_valid(r) THEN TRUE
                            ELSE json_type(r) <> 'OBJECT' END
    )
    SELECT key, n_rows, sum_val, min_val, max_val
    FROM stats ORDER BY key
"""
