"""Scans, filters, sorts, top-k and pagination (SURVEY.md §2.1/2.2/2.6).

The reference pushes LIMIT/ORDER BY into SQLite for four queries
(rpc.js:501,530,549,604) and slices cached arrays for serving
(server.js:127-278). Here every variant is declarative: Catalyst turns
sort+limit into TakeOrderedAndProject and pushes filters/projections
into the parquet scan (verify with .explain: PushedFilters/ReadSchema).

All top-k orderings carry a unique tiebreak key so results are
deterministic across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ._util import dec_sum, money, t


def s9_topk_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S9/S10/O1/O2 (rpc.js:501,530): ORDER BY ... DESC LIMIT k pushdown
    scan -> TakeOrderedAndProject, no global sort materialized."""
    o = t(spark, sf_dir, "orders")
    return (
        o.select(
            "o_orderkey",
            F.to_date("o_orderdate").alias("order_date"),
            "o_totalprice",
        )
        .orderBy(F.desc("order_date"), F.desc("o_orderkey"))
        .limit(10)
    )


def s11_filtered_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S11/F9 (rpc.js:549): conjunctive flag filter, projected scan.
    Both predicates reach the parquet reader as PushedFilters."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.filter((F.col("l_returnflag") == "R") & (F.col("l_linestatus") == "F"))
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber")
    )


def s12_filtered_top1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S12 (rpc.js:604): filter + ORDER BY height DESC LIMIT 1."""
    o = t(spark, sf_dir, "orders")
    return (
        o.filter(F.col("o_orderstatus") == "F")
        .orderBy(F.desc("o_orderdate"), F.desc("o_orderkey"))
        .select("o_orderkey", F.to_date("o_orderdate").alias("order_date"))
        .limit(1)
    )


def f3_range_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3/F4 (rpc.js:12-21,248-249): between-range predicates on the
    height/time axis, pushed to the scan."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            F.col("l_shipdate").between("1996-01-01", "1996-12-31")
            & F.col("l_quantity").between(10, 20)
        )
        .select("l_orderkey", "l_linenumber", "l_quantity",
                F.to_date("l_shipdate").alias("ship_date"))
        .orderBy("l_orderkey", "l_linenumber")
    )


def f8_prefix_until_sentinel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F8 (rpc.js:506-515): walk the top-10 newest rows and keep the
    prefix before the first 'sentinel' row (reference: zero winning
    txid). Positional skip-while via row_number + min-offending-pos."""
    o = t(spark, sf_dir, "orders")
    top = (
        o.orderBy(F.desc("o_orderdate"), F.desc("o_orderkey"))
        .limit(10)
        .withColumn(
            "pos",
            F.row_number().over(
                Window.orderBy(F.desc("o_orderdate"), F.desc("o_orderkey"))
            ).cast("long"),
        )
    )
    sentinel_pos = top.filter(F.col("o_orderstatus") == "O").agg(
        F.coalesce(F.min("pos"), F.lit(11)).alias("cut")
    )
    return (
        top.crossJoin(sentinel_pos)
        .filter(F.col("pos") < F.col("cut"))
        .select("o_orderkey", "o_orderstatus", "pos")
        .orderBy("pos")
    )


def o3_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O3 (rpc.js:278-280): argmax — the deepest branch tip. Deterministic
    tiebreak on the key."""
    o = t(spark, sf_dir, "orders")
    return (
        o.orderBy(F.desc("o_totalprice"), F.desc("o_orderkey"))
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .limit(1)
    )


def o6_tail_slice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O6 (server.js:151-152): `slice(-latest-1)` tail — keeps the LAST
    latest+1 rows (the reference's off-by-one is preserved: latest=20
    yields 21 rows). The global row number is computed by the two-phase
    range-sharded operator — no single-partition window over the table."""
    from ..operators.scalable import global_row_number

    latest = 20
    o = t(spark, sf_dir, "orders")
    return (
        global_row_number(o, [F.desc("o_orderkey")])
        .filter(F.col("rn") <= latest + 1)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .orderBy("o_orderkey")
    )


def o7_offset_pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O7 (server.js:153-155): page/size offset pagination via
    row_number bounds (page 3, size 100 over orderkey order),
    scalable-row-number form (operators/scalable.py)."""
    from ..operators.scalable import global_row_number

    page, size = 3, 100
    o = t(spark, sf_dir, "orders")
    return (
        global_row_number(o, [F.col("o_orderkey")])
        .filter(F.col("rn").between(size * (page - 1) + 1, size * page))
        .select("rn", "o_orderkey", "o_custkey", "o_totalprice")
    )


def o8_range_slice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O8 (server.js:175-187): 1-based inclusive [start, end] row range,
    scalable-row-number form."""
    from ..operators.scalable import global_row_number

    start, end = 101, 150
    o = t(spark, sf_dir, "orders")
    return (
        global_row_number(o, [F.desc("o_orderkey")])
        .filter(F.col("rn").between(start, end))
        .select("rn", "o_orderkey", "o_orderstatus")
    )


def u1_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §2.7: user-facing set operations (absent from the
    reference, free in Spark): UNION / INTERSECT / EXCEPT between
    'BUILDING-segment customers' and 'customers with an urgent
    order', tagged and stacked."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    a = c.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("k"))
    b = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("k")).distinct()
    tagged = (
        a.union(b).distinct().withColumn("op", F.lit("union"))
        .unionByName(a.intersect(b).withColumn("op", F.lit("intersect")))
        .unionByName(a.subtract(b).withColumn("op", F.lit("except")))
    )
    return tagged.select("op", "k").orderBy("op", "k")


def u2_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot/melt (inverse of a17's pivot): per-returnflag wide
    aggregates of three lineitem measures, melted to long
    (flag, measure, value) with DataFrame.unpivot — one pass, no
    union-of-selects re-scan."""
    li = t(spark, sf_dir, "lineitem")
    wide = li.groupBy("l_returnflag").agg(
        money(dec_sum("l_quantity")).alias("qty"),
        money(dec_sum("l_extendedprice")).alias("price"),
        money(dec_sum("l_discount", 4), 4).alias("disc"),
    )
    return (
        wide.unpivot("l_returnflag", ["qty", "price", "disc"],
                     "measure", "value")
        .orderBy("l_returnflag", "measure")
    )


def u3_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO semantics on plain tables: a CDC-style changes set
    (updates: keys ≡ 0 mod 100 get status X and +100.00; inserts:
    negated keys ≡ 1 mod 100) full-outer-joined into the base, each
    row tagged insert/update/keep. One shuffle keyed by the merge key;
    at 100 TB a Delta/Iceberg MERGE adds transactional file rewrite
    but the dataflow — changes ⟗ base on the key, coalesce per column
    — is exactly this."""
    o = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus",
        F.col("o_totalprice").cast("decimal(18,2)").alias("price"))
    upd = o.filter(F.col("o_orderkey") % 100 == 0).select(
        "o_orderkey", F.lit("X").alias("u_status"),
        (F.col("price") + F.lit(100).cast("decimal(18,2)"))
        .alias("u_price"))
    ins = o.filter(F.col("o_orderkey") % 100 == 1).select(
        (-F.col("o_orderkey")).alias("o_orderkey"),
        F.lit("N").alias("u_status"), F.col("price").alias("u_price"))
    merged = o.join(upd.unionByName(ins), "o_orderkey", "full")
    return merged.select(
        "o_orderkey",
        F.coalesce("u_status", "o_orderstatus").alias("status"),
        money(F.coalesce("u_price", "price")).alias("totalprice"),
        F.when(F.col("o_orderstatus").isNull(), F.lit("insert"))
        .when(F.col("u_status").isNotNull(), F.lit("update"))
        .otherwise(F.lit("keep")).alias("action"),
    ).orderBy("o_orderkey")


QUERIES = {
    "s9_topk_scan": s9_topk_scan,
    "u3_upsert": u3_upsert,
    "u2_unpivot": u2_unpivot,
    "u1_set_ops": u1_set_ops,
    "s11_filtered_scan": s11_filtered_scan,
    "s12_filtered_top1": s12_filtered_top1,
    "f3_range_filter": f3_range_filter,
    "f8_prefix_until_sentinel": f8_prefix_until_sentinel,
    "o3_argmax": o3_argmax,
    "o6_tail_slice": o6_tail_slice,
    "o7_offset_pagination": o7_offset_pagination,
    "o8_range_slice": o8_range_slice,
}

ORACLES = {
    "u3_upsert": """
        WITH base AS (
            SELECT o_orderkey, o_orderstatus,
                   CAST(o_totalprice AS DECIMAL(18,2)) AS price
            FROM orders
        ), upd AS (
            SELECT o_orderkey, 'X' AS u_status,
                   price + CAST(100 AS DECIMAL(18,2)) AS u_price
            FROM base WHERE o_orderkey % 100 = 0
        ), ins AS (
            SELECT -o_orderkey AS o_orderkey, 'N' AS u_status,
                   price AS u_price
            FROM base WHERE o_orderkey % 100 = 1
        ), changes AS (
            SELECT * FROM upd UNION ALL SELECT * FROM ins
        ), m AS (
            SELECT coalesce(b.o_orderkey, c.o_orderkey) AS o_orderkey,
                   b.o_orderstatus, b.price, c.u_status, c.u_price
            FROM base b FULL JOIN changes c ON b.o_orderkey = c.o_orderkey
        )
        SELECT o_orderkey,
               coalesce(u_status, o_orderstatus) AS status,
               CAST(round(coalesce(u_price, price), 2) AS DOUBLE)
                   AS totalprice,
               CASE WHEN o_orderstatus IS NULL THEN 'insert'
                    WHEN u_status IS NOT NULL THEN 'update'
                    ELSE 'keep' END AS action
        FROM m ORDER BY o_orderkey
    """,
    "u1_set_ops": """
        WITH a AS (
            SELECT c_custkey AS k FROM customer
            WHERE c_mktsegment = 'BUILDING'
        ), b AS (
            SELECT DISTINCT o_custkey AS k FROM orders
            WHERE o_orderpriority = '1-URGENT'
        )
        SELECT 'union' AS op, k FROM (SELECT k FROM a UNION SELECT k FROM b)
        UNION ALL
        SELECT 'intersect', k FROM (SELECT k FROM a INTERSECT SELECT k FROM b)
        UNION ALL
        SELECT 'except', k FROM (SELECT k FROM a EXCEPT SELECT k FROM b)
        ORDER BY op, k
    """,
    "u2_unpivot": """
        WITH wide AS (
            SELECT l_returnflag,
                   CAST(round(sum(CAST(l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE) AS qty,
                   CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS price,
                   CAST(round(sum(CAST(l_discount AS DECIMAL(18,4))), 4) AS DOUBLE) AS disc
            FROM lineitem GROUP BY l_returnflag
        )
        SELECT l_returnflag, measure, value
        FROM wide
        UNPIVOT (value FOR measure IN (qty, price, disc))
        ORDER BY l_returnflag, measure
    """,
    "s9_topk_scan": """
        SELECT o_orderkey, CAST(o_orderdate AS DATE) AS order_date, o_totalprice
        FROM orders
        ORDER BY order_date DESC, o_orderkey DESC
        LIMIT 10
    """,
    "s11_filtered_scan": """
        SELECT l_orderkey, l_linenumber, l_quantity
        FROM lineitem
        WHERE l_returnflag = 'R' AND l_linestatus = 'F'
        ORDER BY l_orderkey, l_linenumber
    """,
    "s12_filtered_top1": """
        SELECT o_orderkey, CAST(o_orderdate AS DATE) AS order_date
        FROM orders
        WHERE o_orderstatus = 'F'
        ORDER BY o_orderdate DESC, o_orderkey DESC
        LIMIT 1
    """,
    "f3_range_filter": """
        SELECT l_orderkey, l_linenumber, l_quantity,
               CAST(l_shipdate AS DATE) AS ship_date
        FROM lineitem
        WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1996-12-31'
          AND l_quantity BETWEEN 10 AND 20
        ORDER BY l_orderkey, l_linenumber
    """,
    "f8_prefix_until_sentinel": """
        WITH top AS (
            SELECT o_orderkey, o_orderstatus,
                   row_number() OVER (ORDER BY o_orderdate DESC, o_orderkey DESC) AS pos
            FROM orders
            ORDER BY o_orderdate DESC, o_orderkey DESC
            LIMIT 10
        ), cutoff AS (
            SELECT coalesce(min(pos), 11) AS cut FROM top WHERE o_orderstatus = 'O'
        )
        SELECT o_orderkey, o_orderstatus, pos
        FROM top, cutoff
        WHERE pos < cut
        ORDER BY pos
    """,
    "o3_argmax": """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey DESC
        LIMIT 1
    """,
    "o6_tail_slice": """
        WITH ranked AS (
            SELECT o_orderkey, o_orderstatus, o_totalprice,
                   row_number() OVER (ORDER BY o_orderkey DESC) AS rn
            FROM orders
        )
        SELECT o_orderkey, o_orderstatus, o_totalprice
        FROM ranked WHERE rn <= 21
        ORDER BY o_orderkey
    """,
    "o7_offset_pagination": """
        WITH ranked AS (
            SELECT row_number() OVER (ORDER BY o_orderkey) AS rn,
                   o_orderkey, o_custkey, o_totalprice
            FROM orders
        )
        SELECT rn, o_orderkey, o_custkey, o_totalprice
        FROM ranked WHERE rn BETWEEN 201 AND 300
    """,
    "o8_range_slice": """
        WITH ranked AS (
            SELECT row_number() OVER (ORDER BY o_orderkey DESC) AS rn,
                   o_orderkey, o_orderstatus
            FROM orders
        )
        SELECT rn, o_orderkey, o_orderstatus
        FROM ranked WHERE rn BETWEEN 101 AND 150
    """,
}


def o9_keyset_pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyset (seek-method) pagination — the scale-correct sibling of
    o7's offset pagination: WHERE key > cursor ORDER BY key LIMIT n
    compiles to a pushed filter + TakeOrderedAndProject, so page cost
    is O(page), not O(offset + page). o7 exists because the reference
    serves arbitrary offsets; a 100 TB API should hand out cursors."""
    o = t(spark, sf_dir, "orders")
    return (
        o.filter(F.col("o_orderkey") > 1000)
        .orderBy("o_orderkey")
        .limit(20)
        .select("o_orderkey", "o_custkey",
                F.to_date("o_orderdate").alias("order_date"))
    )


QUERIES["o9_keyset_pagination"] = o9_keyset_pagination

ORACLES["o9_keyset_pagination"] = """
    SELECT o_orderkey, o_custkey, CAST(o_orderdate AS DATE) AS order_date
    FROM orders WHERE o_orderkey > 1000
    ORDER BY o_orderkey LIMIT 20
"""


def u4_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-Changing-Dimension Type 2 maintenance on plain tables:
    a CDC update set (every 10th customer gets +100.00 balance)
    applied to the customer dimension produces the versioned history —
    unchanged keys keep their open row, changed keys CLOSE version 1
    (valid_to set, is_current 0) and open version 2. The dataflow is
    one broadcast-or-shuffle join on the dimension key + a union; a
    Delta/Iceberg MERGE adds the transactional file rewrite around
    exactly this plan. Exact decimal money through the money() rule."""
    c = t(spark, sf_dir, "customer").select(
        "c_custkey",
        F.col("c_acctbal").cast("decimal(18,2)").alias("bal"))
    upd = c.filter(F.col("c_custkey") % 10 == 0).select(
        "c_custkey",
        (F.col("bal") + F.lit(100).cast("decimal(18,2)")).alias("new_bal"))
    base = c.join(upd, "c_custkey", "left")
    keep = base.filter(F.col("new_bal").isNull()).select(
        "c_custkey", F.lit(1).alias("version"),
        F.col("bal").alias("acctbal"),
        F.lit(None).cast("string").alias("valid_to"),
        F.lit(1).alias("is_current"))
    closed = base.filter(F.col("new_bal").isNotNull()).select(
        "c_custkey", F.lit(1).alias("version"),
        F.col("bal").alias("acctbal"),
        F.lit("2026-01-01").alias("valid_to"),
        F.lit(0).alias("is_current"))
    opened = base.filter(F.col("new_bal").isNotNull()).select(
        "c_custkey", F.lit(2).alias("version"),
        F.col("new_bal").alias("acctbal"),
        F.lit(None).cast("string").alias("valid_to"),
        F.lit(1).alias("is_current"))
    return (
        keep.unionByName(closed).unionByName(opened)
        .select("c_custkey", F.col("version").cast("int").alias("version"),
                money(F.col("acctbal")).alias("acctbal"),
                "valid_to",
                F.col("is_current").cast("int").alias("is_current"))
        .orderBy("c_custkey", "version")
    )


QUERIES["u4_scd2_history"] = u4_scd2_history

ORACLES["u4_scd2_history"] = """
    WITH c AS (
        SELECT c_custkey, CAST(c_acctbal AS DECIMAL(18,2)) AS bal,
               c_custkey % 10 = 0 AS changed
        FROM customer
    )
    SELECT c_custkey, CAST(1 AS INTEGER) AS version,
           CAST(round(bal, 2) AS DOUBLE) AS acctbal,
           CASE WHEN changed THEN '2026-01-01' END AS valid_to,
           CAST(CASE WHEN changed THEN 0 ELSE 1 END AS INTEGER)
               AS is_current
    FROM c
    UNION ALL
    SELECT c_custkey, 2,
           CAST(round(bal + 100, 2) AS DOUBLE),
           NULL, 1
    FROM c WHERE changed
    ORDER BY c_custkey, version
"""


def u5_changelog_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC changelog apply — MERGE INTO semantics on plain tables (the
    u4 SCD2 companion: u4 keeps history, u5 produces the current
    snapshot): a base table + an ordered changelog of upserts/deletes
    collapse to latest-op-per-key (max_by on the sequence number —
    one combinable aggregate, no per-key sort), then one full outer
    join applies it: delete drops the row, upsert wins over base,
    untouched base rows pass through. The changelog is simulated from
    the documents table with MULTIPLE ops per key (seq 1 then seq 2)
    so latest-wins is actually exercised: %7 docs get two successive
    text revisions, %13 docs a delete, and %11 keys arrive as brand
    new inserts. Output is doc-level digests, pinning the exact merge
    result, plus the op provenance."""
    from ..operators.dedup import normalize_text

    docs = t(spark, sf_dir, "documents")
    base = docs.select("doc_id",
                       F.md5(normalize_text(F.col("text"))).alias("dig"))
    rev1 = docs.filter(F.col("doc_id") % 7 == 0).select(
        "doc_id", F.lit(1).alias("seq"), F.lit("U").alias("op"),
        F.md5(normalize_text(F.concat(F.col("text"), F.lit(" v2"))))
        .alias("new_dig"))
    rev2 = docs.filter(F.col("doc_id") % 7 == 0).select(
        "doc_id", F.lit(2).alias("seq"), F.lit("U").alias("op"),
        F.md5(normalize_text(F.concat(F.col("text"), F.lit(" v3"))))
        .alias("new_dig"))
    dels = docs.filter(F.col("doc_id") % 13 == 0).select(
        "doc_id", F.lit(3).alias("seq"), F.lit("D").alias("op"),
        F.lit(None).cast("string").alias("new_dig"))
    # insert keys live on the NEGATIVE axis (-id - 1): disjoint from
    # the real doc_id domain (>= 0) at every corpus size, unlike an
    # additive offset which collides once the corpus outgrows it
    ins = docs.filter(F.col("doc_id") % 11 == 0).select(
        (-F.col("doc_id") - 1).alias("doc_id"),
        F.lit(1).alias("seq"), F.lit("U").alias("op"),
        F.md5(normalize_text(F.concat(F.lit("new "), F.col("text"))))
        .alias("new_dig"))
    log = rev1.unionByName(rev2).unionByName(dels).unionByName(ins)
    latest = log.groupBy("doc_id").agg(
        F.max(F.struct("seq", "op", "new_dig")).alias("_m")
    ).select("doc_id", F.col("_m.op").alias("op"),
             F.col("_m.new_dig").alias("new_dig"))
    merged = base.join(latest, "doc_id", "full")
    return (
        merged.filter(F.coalesce(F.col("op"), F.lit("")) != "D")
        .select(
            "doc_id",
            F.coalesce("new_dig", "dig").alias("dig"),
            F.when(F.col("dig").isNull(), "inserted")
            .when(F.col("op") == "U", "updated")
            .otherwise("kept").alias("status"),
        )
        .orderBy("doc_id")
    )


QUERIES["u5_changelog_apply"] = u5_changelog_apply

ORACLES["u5_changelog_apply"] = """
    WITH nrm AS (
        SELECT doc_id,
               trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS nt
        FROM documents
    ), base AS (
        SELECT doc_id, md5(nt) AS dig FROM nrm
    ), log AS (
        SELECT doc_id, 1 AS seq, 'U' AS op, md5(nt || ' v2') AS new_dig
        FROM nrm WHERE doc_id % 7 = 0
        UNION ALL
        SELECT doc_id, 2, 'U', md5(nt || ' v3')
        FROM nrm WHERE doc_id % 7 = 0
        UNION ALL
        SELECT doc_id, 3, 'D', NULL FROM nrm WHERE doc_id % 13 = 0
        UNION ALL
        SELECT -doc_id - 1, 1, 'U', md5('new ' || nt)
        FROM nrm WHERE doc_id % 11 = 0
    ), latest AS (
        SELECT doc_id,
               max({'seq': seq, 'op': op, 'new_dig': new_dig}) AS m
        FROM log GROUP BY doc_id
    ), lat AS (
        SELECT doc_id, m.op AS op, m.new_dig AS new_dig FROM latest
    ), merged AS (
        SELECT coalesce(b.doc_id, l.doc_id) AS doc_id,
               b.dig AS dig, l.op AS op, l.new_dig AS new_dig
        FROM base b FULL JOIN lat l ON b.doc_id = l.doc_id
    )
    SELECT doc_id,
           coalesce(new_dig, dig) AS dig,
           CASE WHEN dig IS NULL THEN 'inserted'
                WHEN op = 'U' THEN 'updated'
                ELSE 'kept' END AS status
    FROM merged WHERE coalesce(op, '') <> 'D'
    ORDER BY doc_id
"""


U6_FORMATS = ("parquet", "orc", "json", "csv")


def u6_format_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Storage-format fidelity audit: the documents table is written
    to ORC, JSON and CSV and read back, and every format must carry
    IDENTICAL content — one row per format with the row count and an
    order-insensitive content digest (Σ over rows of the first 48
    bits of md5(doc_id|source|lang|text), accumulated in
    DECIMAL(38,0) / HUGEINT so the sum never wraps int64 at any
    corpus size — the a26 discipline applied to IO). The DuckDB
    oracle computes the expected digest ONCE from the parquet source
    and asserts every format matches it (the a16 expected-verdict
    pattern applied to IO): a writer/reader that mangles newlines,
    quoting, unicode or nulls flips the digest and the row goes red.
    CSV is the deliberate stress case — embedded newlines force
    multiLine quoted reads. The per-format results materialize
    EAGERLY inside the query (4 bounded rows) so the scratch dir is
    removed before return — repeated sweeps leave no /tmp residue.

    EAGER-SEMANTICS CAVEAT (deliberate trade, documented per round-7
    ADVICE): because the write/read/digest runs at DataFrame-
    CONSTRUCTION time, plan-only consumers (tools/plan_audit.py
    explains every queries() entry) pay the full IO side effect, and
    the returned frame is a LocalTableScan of 4 rows — so u6's plan
    audit inspects the bounded result, not the IO pipeline (vacuous
    by construction; the pipeline's plan hygiene is covered by the
    s1-class scans it composes). The alternative — stay lazy and
    clean the scratch dir via an exit hook — leaks the dir for the
    lifetime of every sweep process and makes the query's result
    depend on hook ordering; eager-and-clean is the smaller wart."""
    import shutil
    import tempfile

    cols = ["doc_id", "source", "lang", "text"]
    base = t(spark, sf_dir, "documents").select(*cols)
    digest = F.sum(
        F.conv(F.substring(
            F.md5(F.concat_ws("|", *cols)), 1, 12), 16, 10)
        .cast("decimal(38,0)"))

    def report(df: DataFrame, fmt: str) -> DataFrame:
        # digest_sum travels as a STRING of the full decimal value:
        # decimal columns hash engine-dependently at the driver, a
        # string of the exact integer does not
        return df.agg(
            F.count("*").cast("long").alias("n_rows"),
            digest.cast("string").alias("digest_sum"),
        ).select(F.lit(fmt).alias("fmt"), "n_rows", "digest_sum")

    out = report(base, "parquet")
    tmp = tempfile.mkdtemp(prefix="sg_fmt_rt_")
    try:
        for fmt in U6_FORMATS[1:]:
            path = f"{tmp}/{fmt}"
            w = base.write.mode("overwrite").format(fmt)
            if fmt == "csv":
                w = w.option("header", True).option("escape", '"')
            w.save(path)
            r = spark.read.format(fmt)
            if fmt == "csv":
                r = (r.option("header", True).option("multiLine", True)
                     .option("escape", '"')
                     .schema(base.schema))
            elif fmt == "json":
                r = r.schema(base.schema)
            out = out.unionByName(report(r.load(path), fmt))
        rows = out.orderBy("fmt").collect()
        schema = out.schema
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.createDataFrame(rows, schema).orderBy("fmt")


QUERIES["u6_format_roundtrip"] = u6_format_roundtrip

ORACLES["u6_format_roundtrip"] = """
    WITH src AS (
        SELECT CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(CAST(CAST(('0x' || substring(md5(
                   CAST(doc_id AS VARCHAR) || '|' || source || '|'
                   || lang || '|' || text), 1, 12)) AS BIGINT)
                   AS HUGEINT)) AS VARCHAR) AS digest_sum
        FROM documents
    )
    SELECT fmt, n_rows, digest_sum
    FROM src, unnest(['csv', 'json', 'orc', 'parquet']) AS u(fmt)
    ORDER BY fmt
"""


def u7_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution read audit — the data-lake reality every
    long-lived corpus hits: generation 1 of a dataset was written
    without a `quality` column (even doc_ids), generation 2 added it
    (odd doc_ids, quality = (doc_id*13) % 100); both live under one
    dataset root as gen=N directories. The read side exercises TWO
    lake mechanisms at once: partition DISCOVERY (the gen=N path
    fragment becomes a queryable column) and mergeSchema (the union
    schema is reconciled across file generations, v1 rows surfacing
    NULL quality). The report per generation — row count, quality
    nulls, quality sum — is what a migration owner checks before
    backfilling. Eager-and-clean per the u6 discipline (bounded 2-row
    result collected, scratch removed before return; same
    plan-audit-vacuous caveat as u6's docstring)."""
    import shutil
    import tempfile

    docs = t(spark, sf_dir, "documents")
    tmp = tempfile.mkdtemp(prefix="sg_schema_evo_")
    try:
        (docs.filter(F.col("doc_id") % 2 == 0)
         .select("doc_id", "source")
         .write.mode("overwrite").parquet(f"{tmp}/data/gen=1"))
        (docs.filter(F.col("doc_id") % 2 == 1)
         .select("doc_id", "source",
                 ((F.col("doc_id") * 13) % 100).cast("long")
                 .alias("quality"))
         .write.mode("overwrite").parquet(f"{tmp}/data/gen=2"))
        merged = (spark.read.option("mergeSchema", True)
                  .parquet(f"{tmp}/data"))
        out = (
            merged.groupBy(F.col("gen").cast("int").alias("gen"))
            .agg(F.count("*").cast("long").alias("n_rows"),
                 F.sum(F.col("quality").isNull().cast("long"))
                 .alias("n_null_quality"),
                 F.coalesce(F.sum("quality"), F.lit(0)).cast("long")
                 .alias("sum_quality"))
            .orderBy("gen")
        )
        rows = out.collect()
        schema = out.schema
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.createDataFrame(rows, schema).orderBy("gen")


QUERIES["u7_schema_evolution"] = u7_schema_evolution

ORACLES["u7_schema_evolution"] = """
    SELECT CAST(1 AS INTEGER) AS gen,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(*) AS BIGINT) AS n_null_quality,
           CAST(0 AS BIGINT) AS sum_quality
    FROM documents WHERE doc_id % 2 = 0
    UNION ALL
    SELECT CAST(2 AS INTEGER),
           CAST(count(*) AS BIGINT),
           CAST(0 AS BIGINT),
           CAST(sum((doc_id * 13) % 100) AS BIGINT)
    FROM documents WHERE doc_id % 2 = 1
    ORDER BY gen
"""
