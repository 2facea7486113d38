"""Scalable global-order window operators.

A ``Window.orderBy(...)`` with no ``partitionBy`` forces every row
through ONE partition (Spark warns: "No Partition Defined for Window
operation"). Fine for a bounded series (the canonical chain, a date
spine); fatal for a fact table at 100 TB. The reference itself computes
these shapes single-threaded over JS arrays (pagination slices
server.js:151-187, running sums mining_monitor_rpc.js:50-70), so it has
the same scaling wall — this module is the Spark-native fix.

Two-phase pattern (the classic distributed prefix computation):

1. assign each row a *shard id* = its range bucket in the requested
   order, so shard boundaries are contiguous in the global order;
2. run the window WITHIN each shard (``partitionBy(shard)`` — fully
   parallel, no single-partition exchange on the big data);
3. compute one summary row per shard (count / sum / last value — a few
   hundred rows total), prefix-scan THAT tiny table, and broadcast-join
   the per-shard offsets back.

The only single-partition window left runs over #shards rows, not
#data rows. Requires a *total* order (callers pass a unique tiebreak
key, same rule every deterministic query here already follows).

Plan independence (the round-2 ``dp5`` lesson): an earlier version
derived the shard id from ``spark_partition_id()`` after a
``repartitionByRange`` and relied on the planner reusing that exchange
across the window branch and the per-shard-totals branch. That is an
implicit planner contract, not a guarantee — AQE, a different
``spark.sql.shuffle.partitions``, or a non-reused exchange could assign
the two branches different ids. Now the shard id is a PURE FUNCTION of
the row's own order-key value: range boundaries are sampled once
(deterministically, via an md5-threshold filter) and folded into the
plan as literals,
so every branch — under any session conf, any adaptive re-plan — maps a
row to the same shard. Pinned by ``tests/test_scalable.py``
(``test_plan_independent_across_session_confs``, and the plan test
asserts no ``spark_partition_id`` call survives).

Boundaries are drawn FROM actual key values, so every non-trailing
shard is non-empty (its own boundary value lands in it); ``global_lag``
additionally chains per-shard last values with a tiny-table ``lag`` so
even an empty shard (impossible today, cheap to guard) would not break
the boundary patch.

Classic (JVM) PySpark only: the sort-direction introspection reads the
Column's internal SortOrder node via py4j.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.column import Column as _PyColumn

_PID = "_sc_pid"
_LRN = "_sc_lrn"
_OFF = "_sc_off"

# boundary sample size per shard: n*128 rows collected to the driver —
# a few thousand rows at most, independent of data size
_SAMPLE_PER_SHARD = 128


def _sort_spec(col: Column, jvm) -> tuple[Column, bool]:
    """Split a possibly-SortOrder Column into (value column, descending).

    ``F.desc("k")`` / ``col.desc()`` build an internal SortOrder node;
    plain columns pass through as ascending. Default null ordering only
    (ASC NULLS FIRST / DESC NULLS LAST) — order keys here are non-null
    by contract (they include a unique tiebreak key).
    """
    node = col._jc.node()
    if node.getClass().getSimpleName() == "SortOrder":
        value = _PyColumn(jvm.org.apache.spark.sql.Column(node.child()))
        descending = "Descending" in node.sortDirection().toString()
        return value, descending
    return col, False


# (plan semanticHash, key expr, n, desc) -> boundary list. Safe by
# construction: the global_* results are identical under ANY contiguous
# bucketing (offsets correct per shard), so a stale entry can only skew
# shard balance, never values. Bounded FIFO.
_BOUNDS_CACHE: dict = {}
_BOUNDS_CACHE_MAX = 64


def _range_boundaries(df: DataFrame, key: Column, descending: bool,
                      n: int) -> list:
    """n-1 range cut points for ``key``, sampled from the data itself.

    Deterministic given the data, and the driver collect is bounded by
    DISTINCT keys, not rows: keys whose md5 32-bit prefix falls under
    cap/approx_distinct survive (survival is a pure function of the key
    value), and surviving rows are pre-aggregated to (key, count) pairs
    before collect — so a heavy-hitter key that wins the lottery
    contributes ONE pair, never its full row multiset (the round-3
    ADVICE bound hole). Frequency weighting is preserved through the
    count: boundaries are weighted quantiles over the sampled pairs
    (Horvitz-Thompson — uniform key-survival probability means sampled
    weight mass per interval is proportional to true row mass).

    Two cheap jobs at plan-build time: a map-side-combinable
    approx_count_distinct probe (replacing the round-3 exact count()
    full scan) and the filtered groupBy collect, whose shuffle carries
    only surviving keys after map-side partial aggregation. The result
    becomes plan literals instead of exchange-internal state, cached
    per (plan, key, n); staleness cannot corrupt results — the global_*
    outputs are identical under ANY contiguous bucketing.
    """
    if n <= 1:
        return []
    try:
        ck = (df.semanticHash(), str(key._jc), n, descending)
    except Exception:
        ck = None
    if ck is not None and ck in _BOUNDS_CACHE:
        return _BOUNDS_CACHE[ck]
    cap = n * _SAMPLE_PER_SHARD
    keyed = df.select(key.alias("_k")).where(F.col("_k").isNotNull())
    md5_of_key = F.md5(F.col("_k").cast("string"))
    approx = keyed.agg(
        F.approx_count_distinct("_k").alias("_d")).collect()[0]["_d"]
    if approx == 0:
        pairs: list = []
    elif approx <= (cap * 4) // 5:
        # few distinct keys (HLL error ~2% << the 20% margin): collect
        # them all, with counts — bounded by ~cap pairs
        pairs = keyed.groupBy("_k").agg(F.count("*").alias("_c")).collect()
    else:
        thr = (1 << 32) * cap // approx + 1
        h = F.conv(F.substring(md5_of_key, 1, 8), 16, 10).cast("bigint")
        pairs = (
            keyed.where(h < F.lit(thr))
            .groupBy("_k").agg(F.count("*").alias("_c"))
            .collect()
        )
        if not pairs:
            # degenerate: lottery missed every key (possible when the
            # HLL estimate is far above the true distinct count).
            # Deterministic pick: md5-ordered distinct prefix — any
            # distinct values are valid cut points.
            pairs = (
                keyed.groupBy("_k").agg(F.count("*").alias("_c"))
                .orderBy(md5_of_key, F.col("_k"))
                .limit(cap).collect()
            )
    if not pairs:
        bounds: list = []
    else:
        # Python sort order matches Spark's for every key type used here
        # (ints/longs/decimals numerically; str by code point == UTF-8
        # binary order; date/datetime chronologically).
        pairs.sort(key=lambda r: r["_k"], reverse=descending)
        weight = sum(r["_c"] for r in pairs)
        bounds = []
        cum = 0
        it = iter(range(1, n))
        target = next(it) * weight // n
        for r in pairs:
            cum += r["_c"]
            while cum > target:
                b = r["_k"]
                if not bounds or b != bounds[-1]:
                    bounds.append(b)
                nxt = next(it, None)
                if nxt is None:
                    target = weight + 1  # exhausted: no more cuts
                    break
                target = nxt * weight // n
    if ck is not None:
        if len(_BOUNDS_CACHE) >= _BOUNDS_CACHE_MAX:
            _BOUNDS_CACHE.pop(next(iter(_BOUNDS_CACHE)))
        _BOUNDS_CACHE[ck] = bounds
    return bounds


def _bucket_expr(key: Column, bounds: list, descending: bool) -> Column:
    """Shard id as a pure row expression: how many boundaries this
    row's key has passed in the requested order. Ties with a boundary
    land in the earlier shard — consistent everywhere because the
    comparison is against the same literals in every branch."""
    if not bounds:
        return F.lit(0)
    pid: Column = F.lit(0)
    for b in bounds:
        passed = (key < F.lit(b)) if descending else (key > F.lit(b))
        pid = pid + F.when(passed, F.lit(1)).otherwise(F.lit(0))
    if descending:
        # DESC NULLS LAST: a null key sorts after everything
        pid = F.when(key.isNull(), F.lit(len(bounds))).otherwise(pid)
    return pid.cast("int")


def _sharded(df: DataFrame, order_by: list[Column],
             num_partitions: int | None) -> DataFrame:
    n = num_partitions or int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    key, descending = _sort_spec(order_by[0], df.sparkSession._jvm)
    bounds = _range_boundaries(df, key, descending, n)
    part = df.withColumn(_PID, _bucket_expr(key, bounds, descending))
    # co-locate each shard; the shard-local window and the per-shard
    # aggregate both cluster on _PID, so this one hash exchange serves
    # every branch (and correctness no longer depends on its reuse)
    return part.repartition(n, F.col(_PID))


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


def global_rank(df: DataFrame, order_by: list[Column],
                rank_col: str = "rnk", dense_col: str = "drnk",
                ntile: int | None = None, ntile_col: str = "tile",
                num_partitions: int | None = None) -> DataFrame:
    """Globally-ordered rank() / dense_rank() (and optionally ntile)
    without a single-partition window over the data.

    Tie-correct by construction: the engine ranks DISTINCT order-key
    tuples (with their row multiplicities), not rows —
      dense_rank = two-phase row_number over the distinct-key table;
      rank      = (cumulative row count through this key) − count + 1;
    then joins back to the rows on the key tuple (equi shuffle join —
    the distinct-key table can be vocabulary-sized, so no broadcast
    assumption). The only single-partition window is over the
    O(shards) summary table, same as the sibling engines.

    ``ntile`` uses the SQL-standard bucket split (first ``total mod n``
    buckets get one extra row) computed from rank and the global total,
    which matches Window.ntile exactly when the order is total (unique
    keys). With ties, Window.ntile splits tied rows across buckets in
    nondeterministic physical order — this engine instead gives every
    tied row the tile of its rank, the only deterministic choice.
    """
    jvm = df.sparkSession._jvm
    specs = [_sort_spec(c, jvm) for c in order_by]
    knames = [f"_gk{i}" for i in range(len(specs))]
    dist = (
        df.select(*(v.alias(k) for (v, _), k in zip(specs, knames)))
        .groupBy(*knames).agg(F.count("*").alias("_cnt"))
    )
    order2 = [
        F.col(k).desc() if desc else F.col(k).asc()
        for (_, desc), k in zip(specs, knames)
    ]
    part = _sharded(dist, order2, num_partitions)
    w_local = Window.partitionBy(_PID).orderBy(*order2)
    w_frame = w_local.rowsBetween(Window.unboundedPreceding,
                                  Window.currentRow)
    local = (
        part.withColumn(_LRN, F.row_number().over(w_local))
        .withColumn("_lcum", F.sum("_cnt").over(w_frame))
    )
    per = part.groupBy(_PID).agg(
        F.count("*").alias("_nk"), F.sum("_cnt").alias("_nr"))
    w_off = Window.orderBy(_PID).rowsBetween(Window.unboundedPreceding, -1)
    w_all = Window.orderBy(_PID).rowsBetween(Window.unboundedPreceding,
                                             Window.unboundedFollowing)
    offs = (
        per.withColumn("_offk", F.coalesce(F.sum("_nk").over(w_off),
                                           F.lit(0)))
        .withColumn("_offr", F.coalesce(F.sum("_nr").over(w_off), F.lit(0)))
        .withColumn("_tot", F.sum("_nr").over(w_all))
        .select(_PID, "_offk", "_offr", "_tot")
    )
    ranked = local.join(F.broadcast(offs), _PID).select(
        *knames,
        (F.col(_LRN) + F.col("_offk")).cast("long").alias(dense_col),
        (F.col("_lcum") + F.col("_offr") - F.col("_cnt") + 1)
        .cast("long").alias(rank_col),
        F.col("_tot").cast("long").alias("_tot"),
    )
    if ntile is not None:
        # integer div throughout — float division would misbucket once
        # totals approach 2^53 (the scale this module exists for)
        t = int(ntile)
        ranked = (
            ranked.withColumn("_q", F.expr(f"_tot div {t}"))
            .withColumn("_rem", F.col("_tot") % t)
            .withColumn("_big", F.col("_rem") * (F.col("_q") + 1))
            .withColumn(
                ntile_col,
                F.when(
                    F.col(rank_col) <= F.col("_big"),
                    F.expr(f"({rank_col} - 1) div (_q + 1) + 1"),
                ).otherwise(
                    F.expr(f"_rem + ({rank_col} - _big - 1) div _q + 1")
                ).cast("long"),
            )
            .drop("_q", "_rem", "_big")
        )
    ranked = ranked.drop("_tot")
    rows = df.select(
        "*", *(v.alias(k) for (v, _), k in zip(specs, knames)))
    return rows.join(ranked, knames).drop(*knames)


def global_lag(df: DataFrame, order_by: list[Column], value: Column,
               out_col: str = "prev",
               num_partitions: int | None = None) -> DataFrame:
    """Globally-ordered lag(value, 1): shard-local lag, with each
    shard's first row patched from the previous non-empty shard's last
    value (one boundary row per shard, chained by a tiny-table ``lag``
    so shard-id gaps cannot drop the patch, then broadcast back)."""
    part = _sharded(df, order_by, num_partitions)
    w_local = Window.partitionBy(_PID).orderBy(*order_by)
    w_shard = Window.partitionBy(_PID)
    local = (
        part.withColumn("_llag", F.lag(value).over(w_local))
        .withColumn(_LRN, F.row_number().over(w_local))
        .withColumn("_pcnt", F.count("*").over(w_shard))
    )
    # last row of each shard -> boundary value for the NEXT shard,
    # chained over the tiny per-shard table (one row per shard)
    lasts = (
        local.filter(F.col(_LRN) == F.col("_pcnt"))
        .select(F.col(_PID), value.alias("_last"))
    )
    bounds = lasts.withColumn(
        "_prev_shard", F.lag("_last").over(Window.orderBy(_PID))
    ).select(_PID, "_prev_shard")
    return (
        local.join(F.broadcast(bounds), _PID, "left")
        .withColumn(
            out_col,
            F.when(F.col(_LRN) == 1, F.col("_prev_shard"))
            .otherwise(F.col("_llag")),
        )
        .drop(_PID, _LRN, "_llag", "_pcnt", "_prev_shard")
    )
