"""Delta-log table-format queries (dl*): time travel, CDC, row diff.

Round 12 built the from-scratch Delta-protocol adapter
(sources/deltalog.py) as the gold-store backend a 100 TB deployment
actually integrates; until now it was unit-tested only. This module
makes the format's *query surface* first-class in the oracle gate, the
way a lakehouse user consumes it:

* dl1 — time travel: read every committed version of a table and
  report per-version aggregates (`VERSION AS OF` semantics).
* dl2 — change-data-capture: `table_changes(v_from, v_to)` file-level
  insert/delete rows per commit (Delta CDF's non-CDF reconstruction).
* dl3 — snapshot diff: exact row-level delta between two versions via
  multiset EXCEPT — the audit query behind "what did this overwrite
  actually change?".

All three share ONE deterministic 4-version table built from the
`events` parquet (built once per corpus fingerprint, staged + atomic
rename so racing builders and sweep shards converge):

    v0  overwrite  segment A  = event_id % 10 in 0..5   (first load)
    v1  append     segment B  = event_id % 10 in 6..7   (daily ingest)
    v2  append     segment C  = event_id % 10 = 8       (daily ingest)
    v3  overwrite  (A∪B∪C where cents >= 500) ∪ E       (compacting
                   E = event_id % 10 = 9                 rewrite: purge
                                                         low-value rows,
                                                         land a new
                                                         segment)

Everything the queries output is a pure function of the events rows
(never of physical file layout), so the DuckDB oracle replays the
version states as set algebra over `events` — the same way the j9
oracle replays the chain walk. `cents = floor(value*100)` keeps the
money integer-exact in both engines.

Reference: the reference's gold store is a Redis pointer swap
(server.js:295-299) with no history; this family is the extension
surface a real deployment needs the day it asks "what changed between
yesterday's snapshot and today's?".
"""

from __future__ import annotations

import hashlib
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.deltalog import DeltaLogTable
from ._util import t

QUERIES: dict = {}
ORACLES: dict = {}

# bump to invalidate persisted script tables when the build script or
# the adapter's row-visible behavior changes
DELTA_SCRIPT_VERSION = 1

_KEEP_CENTS = 500


def _script_path(sf_dir: str) -> str:
    """Deterministic per-corpus table location, fingerprinted by the
    events parquet's (path, size, mtime) — the dd15/sim19 staleness
    rule applied to the delta-script artifact."""
    src = os.path.join(sf_dir, "events.parquet")
    st = os.stat(src)
    fp = hashlib.sha256(
        f"{src}|{st.st_size}|{st.st_mtime_ns}|"
        f"v{DELTA_SCRIPT_VERSION}".encode()).hexdigest()[:16]
    return f"/tmp/sg_delta_script/{fp}"


def _base(spark: SparkSession, sf_dir: str) -> DataFrame:
    return t(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type",
        F.floor(F.col("value") * 100).cast("long").alias("cents"),
        (F.col("event_id") % 10).alias("_m"))


def _delta_table(spark: SparkSession, sf_dir: str) -> DeltaLogTable:
    """Build (once) and open the shared 4-version script table.
    Staged build + atomic directory rename: concurrent sweep shards
    either win the rename or discard their stage — readers only ever
    see a COMPLETE 4-version log (and the log contents are a
    deterministic function of the corpus, so every builder writes the
    same row sets)."""
    path = _script_path(sf_dir)
    if not os.path.isdir(os.path.join(path, "_delta_log")):
        stage = f"{path}.build-{os.getpid()}"
        shutil.rmtree(stage, ignore_errors=True)
        tbl = DeltaLogTable(stage)
        base = _base(spark, sf_dir)
        seg = lambda lo, hi: (base.filter(F.col("_m").between(lo, hi))
                              .drop("_m"))
        tbl.overwrite(seg(0, 5))                              # v0
        tbl.append(seg(6, 7))                                 # v1
        tbl.append(seg(8, 8))                                 # v2
        v2_state = tbl.to_df(spark, version=2)
        tbl.overwrite(                                        # v3
            v2_state.filter(F.col("cents") >= _KEEP_CENTS)
            .unionByName(seg(9, 9)))
        os.makedirs(os.path.dirname(path), exist_ok=True)
        try:
            os.rename(stage, path)
        except OSError:
            shutil.rmtree(stage, ignore_errors=True)  # lost the race
    return DeltaLogTable(path)


def _version_agg(df: DataFrame, version: int) -> DataFrame:
    return df.agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("user_id").alias("n_users"),
        F.sum("cents").alias("cents_sum"),
    ).select(F.lit(version).cast("long").alias("version"), "*")


def dl1_delta_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time travel: `VERSION AS OF v` reads of all four committed
    versions of the script table, reported as per-version aggregates.
    Pins that overwrite/append commits layer correctly and that every
    historical snapshot stays readable (the adapter's log replay +
    checkpoint path). Each version's read is an O(files-at-v) parquet
    scan with the log's schema — no full-table history scan."""
    tbl = _delta_table(spark, sf_dir)
    out = _version_agg(tbl.to_df(spark, version=0), 0)
    for v in (1, 2, 3):
        out = out.unionByName(
            _version_agg(tbl.to_df(spark, version=v), v))
    return out.orderBy("version")


QUERIES["dl1_delta_time_travel"] = dl1_delta_time_travel


def dl2_delta_table_changes(spark: SparkSession,
                            sf_dir: str) -> DataFrame:
    """Change-data-capture over commits 2..3: `table_changes` replays
    each commit's dataChange add/remove actions as insert/delete rows
    (file-level — exact row CDC for the append at v2; the v3 overwrite
    surfaces as delete-of-state + insert-of-state, which is precisely
    what the protocol records). Grouped per (commit, change type) so
    the output is O(commits), not O(rows)."""
    tbl = _delta_table(spark, sf_dir)
    return (tbl.table_changes(spark, 2, 3)
            .groupBy(F.col("_commit_version").alias("commit_version"),
                     F.col("_change_type").alias("change_type"))
            .agg(F.count("*").alias("n_rows"),
                 F.sum("cents").alias("cents_sum"),
                 F.min("event_id").alias("min_event_id"),
                 F.max("event_id").alias("max_event_id"))
            .orderBy("commit_version", "change_type"))


QUERIES["dl2_delta_table_changes"] = dl2_delta_table_changes


def dl3_delta_snapshot_diff(spark: SparkSession,
                            sf_dir: str) -> DataFrame:
    """Row-level audit of the v3 compacting overwrite: multiset
    EXCEPT between version 3 and version 2 in both directions — what
    the rewrite inserted (the new E segment) and what it purged (the
    low-value rows). This is the semantic diff dl2's file-level CDC
    cannot see through an overwrite; at fleet scale it's one
    shuffle-on-all-columns per direction (Spark's hash-based
    ExceptAll), bounded by the two snapshots. Grouped per (change
    type, event type)."""
    tbl = _delta_table(spark, sf_dir)
    new = tbl.to_df(spark, version=3)
    old = tbl.to_df(spark, version=2)
    diff = (new.exceptAll(old)
            .select("*", F.lit("insert").alias("change_type"))
            .unionByName(
                old.exceptAll(new)
                .select("*", F.lit("delete").alias("change_type"))))
    return (diff.groupBy("change_type", "event_type")
            .agg(F.count("*").alias("n_rows"),
                 F.countDistinct("user_id").alias("n_users"),
                 F.sum("cents").alias("cents_sum"))
            .orderBy("change_type", "event_type"))


QUERIES["dl3_delta_snapshot_diff"] = dl3_delta_snapshot_diff


# ---- oracles ------------------------------------------------------------

_SCRIPT_CTES = f"""
    WITH base AS MATERIALIZED (
        SELECT event_id, user_id, event_type,
               CAST(floor(value * 100) AS BIGINT) AS cents,
               event_id % 10 AS m
        FROM events
    ), v2_state AS MATERIALIZED (
        SELECT event_id, user_id, event_type, cents
        FROM base WHERE m BETWEEN 0 AND 8
    ), v3_state AS MATERIALIZED (
        SELECT * FROM v2_state WHERE cents >= {_KEEP_CENTS}
        UNION ALL
        SELECT event_id, user_id, event_type, cents
        FROM base WHERE m = 9
    )
"""

_VAGG = ("CAST(count(*) AS BIGINT) AS n_rows, "
         "CAST(count(DISTINCT user_id) AS BIGINT) AS n_users, "
         "CAST(sum(cents) AS BIGINT) AS cents_sum")

ORACLES["dl1_delta_time_travel"] = f"""
    {_SCRIPT_CTES}
    SELECT CAST(0 AS BIGINT) AS version, {_VAGG}
    FROM base WHERE m BETWEEN 0 AND 5
    UNION ALL
    SELECT CAST(1 AS BIGINT), {_VAGG} FROM base WHERE m BETWEEN 0 AND 7
    UNION ALL
    SELECT CAST(2 AS BIGINT), {_VAGG} FROM v2_state
    UNION ALL
    SELECT CAST(3 AS BIGINT), {_VAGG} FROM v3_state
    ORDER BY version
"""

_CAGG = ("CAST(count(*) AS BIGINT) AS n_rows, "
         "CAST(sum(cents) AS BIGINT) AS cents_sum, "
         "CAST(min(event_id) AS BIGINT) AS min_event_id, "
         "CAST(max(event_id) AS BIGINT) AS max_event_id")

ORACLES["dl2_delta_table_changes"] = f"""
    {_SCRIPT_CTES}
    SELECT CAST(2 AS BIGINT) AS commit_version,
           'insert' AS change_type, {_CAGG}
    FROM base WHERE m = 8
    UNION ALL
    SELECT CAST(3 AS BIGINT), 'delete', {_CAGG} FROM v2_state
    UNION ALL
    SELECT CAST(3 AS BIGINT), 'insert', {_CAGG} FROM v3_state
    ORDER BY commit_version, change_type
"""

ORACLES["dl3_delta_snapshot_diff"] = f"""
    {_SCRIPT_CTES}
    SELECT 'insert' AS change_type, event_type, {_VAGG}
    FROM base WHERE m = 9 GROUP BY event_type
    UNION ALL
    SELECT 'delete' AS change_type, event_type, {_VAGG}
    FROM v2_state WHERE cents < {_KEEP_CENTS} OR cents IS NULL
    GROUP BY event_type
    ORDER BY change_type, event_type
"""


def _stream_src_dir(spark: SparkSession, sf_dir: str) -> str:
    """Two-file parquet source for the st18 file stream (one
    micro-batch per file under maxFilesPerTrigger=1): the streamed
    half of the script's base rows (event_id % 10 in 5..9), split by
    user_id parity. Built once per corpus fingerprint, staged +
    atomic rename like the script table."""
    import glob

    src = os.path.join(sf_dir, "events.parquet")
    st = os.stat(src)
    fp = hashlib.sha256(
        f"{src}|{st.st_size}|{st.st_mtime_ns}|stream-src|"
        f"v{DELTA_SCRIPT_VERSION}".encode()).hexdigest()[:16]
    path = f"/tmp/sg_delta_stream_src/{fp}"
    if not os.path.isdir(path):
        stage = f"{path}.build-{os.getpid()}"
        shutil.rmtree(stage, ignore_errors=True)
        os.makedirs(stage)
        streamed = _base(spark, sf_dir).filter(F.col("_m") >= 5) \
            .drop("_m")
        for i in (0, 1):
            tmp = os.path.join(stage, f"_w{i}")
            (streamed.filter(F.col("user_id") % 2 == i)
             .coalesce(1).write.mode("overwrite").parquet(tmp))
            part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
            os.rename(part, os.path.join(stage, f"half-{i}.parquet"))
            shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        try:
            os.rename(stage, path)
        except OSError:
            shutil.rmtree(stage, ignore_errors=True)  # lost the race
    return path


def st18_stream_delta_ingest(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """STREAMING ingest into the Delta-log table under the protocol's
    `txn` exactly-once contract (streaming.stream_delta_append): the
    table starts at v0 with the base segment (event_id % 10 <= 4),
    the streamed half arrives as a two-file FILE STREAM (one
    micro-batch per file), and each micro-batch appends under
    txn=(app, batch_id). After the stream drains, the ENTIRE streamed
    half is replayed at the recorded txn version — the at-least-once
    retry — and must be a NO-OP: if the txn check ever failed, the
    final-state aggregates would double and the oracle hash would
    catch it. Output: per-event-type aggregates of the final table
    state and of the streamed commits' CDC rows (table_changes from
    v1 — batch slicing and arrival order cancel out, so the report is
    deterministic at any trigger granularity)."""
    import tempfile
    import uuid

    from ..streaming import stream_delta_append

    src = _stream_src_dir(spark, sf_dir)
    run = uuid.uuid4().hex[:12]
    table = os.path.join(tempfile.gettempdir(), f"sg_st18_tbl_{run}")
    ckpt = os.path.join(tempfile.gettempdir(), f"sg_st18_ckpt_{run}")
    try:
        tbl = DeltaLogTable(table)
        tbl.overwrite(_base(spark, sf_dir)
                      .filter(F.col("_m") <= 4).drop("_m"))
        schema = spark.read.parquet(src).schema
        stream = (spark.readStream.schema(schema)
                  .option("maxFilesPerTrigger", 1).parquet(src))
        q = (stream_delta_append(stream, table, "st18")
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True)
             .start())
        q.awaitTermination()
        # at-least-once retry replay: recorded txn version -> no-op
        v_before = tbl.version()
        tbl.append(spark.read.parquet(src),
                   txn=("st18", tbl.txn_version("st18")))
        assert tbl.version() == v_before, "txn replay committed!"

        agg = lambda df, phase: (
            df.groupBy("event_type")
            .agg(F.count("*").alias("n_rows"),
                 F.sum("cents").alias("cents_sum"))
            .select(F.lit(phase).alias("phase"), "*"))
        out = (agg(tbl.to_df(spark), "final")
               .unionByName(
                   agg(tbl.table_changes(spark, 1), "stream"))
               .orderBy("phase", "event_type"))
        rows, out_schema = out.collect(), out.schema
    finally:
        shutil.rmtree(table, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
    return (spark.createDataFrame(rows, out_schema)
            .orderBy("phase", "event_type"))


QUERIES["st18_stream_delta_ingest"] = st18_stream_delta_ingest

_PAGG = ("CAST(count(*) AS BIGINT) AS n_rows, "
         "CAST(sum(cents) AS BIGINT) AS cents_sum")

ORACLES["st18_stream_delta_ingest"] = f"""
    {_SCRIPT_CTES}
    SELECT 'final' AS phase, event_type, {_PAGG}
    FROM base GROUP BY event_type
    UNION ALL
    SELECT 'stream' AS phase, event_type, {_PAGG}
    FROM base WHERE m BETWEEN 5 AND 9 GROUP BY event_type
    ORDER BY phase, event_type
"""


def _part_table(spark: SparkSession, sf_dir: str) -> DeltaLogTable:
    """Partitioned twin of the script table (partition_by
    event_type, one overwrite of the full base) for the pruned-read
    query — built once per corpus fingerprint, staged + atomic
    rename."""
    src = os.path.join(sf_dir, "events.parquet")
    st = os.stat(src)
    fp = hashlib.sha256(
        f"{src}|{st.st_size}|{st.st_mtime_ns}|part|"
        f"v{DELTA_SCRIPT_VERSION}".encode()).hexdigest()[:16]
    path = f"/tmp/sg_delta_part/{fp}"
    if not os.path.isdir(os.path.join(path, "_delta_log")):
        stage = f"{path}.build-{os.getpid()}"
        shutil.rmtree(stage, ignore_errors=True)
        tbl = DeltaLogTable(stage)
        tbl.overwrite(_base(spark, sf_dir).drop("_m"),
                      partition_by=["event_type"])
        os.makedirs(os.path.dirname(path), exist_ok=True)
        try:
            os.rename(stage, path)
        except OSError:
            shutil.rmtree(stage, ignore_errors=True)  # lost the race
    return DeltaLogTable(path)


def dl4_delta_pruned_read(spark: SparkSession,
                          sf_dir: str) -> DataFrame:
    """Metadata-pruned selective read — the operation that makes a
    100 TB table affordable to query: the partition predicate
    (event_type = 'click') and the stats predicate (cents >= 500,
    against each file's footer min/max recorded in add.stats) are
    evaluated DRIVER-SIDE against the log, so the data scan only
    opens surviving files. Pruning is sound-for-supersets, so the
    same predicates are re-applied row-level — the oracle (a plain
    filter over events) pins that no matching row was skipped. The
    in-query assertion pins that pruning actually dropped files
    (every non-click partition, at minimum)."""
    tbl = _part_table(spark, sf_dir)
    prune = [("event_type", "=", "click"), ("cents", ">=", _KEEP_CENTS)]
    pruned = tbl.live_files(prune=prune)
    assert len(pruned) < len(tbl.live_files()), "pruning was vacuous"
    return (tbl.to_df(spark, prune=prune)
            .filter((F.col("event_type") == "click")
                    & (F.col("cents") >= _KEEP_CENTS))
            .groupBy((F.col("user_id") % 8).alias("bucket"))
            .agg(F.count("*").alias("n_rows"),
                 F.countDistinct("user_id").alias("n_users"),
                 F.sum("cents").alias("cents_sum"))
            .orderBy("bucket"))


QUERIES["dl4_delta_pruned_read"] = dl4_delta_pruned_read

ORACLES["dl4_delta_pruned_read"] = f"""
    WITH base AS (
        SELECT event_id, user_id, event_type,
               CAST(floor(value * 100) AS BIGINT) AS cents
        FROM events
    )
    SELECT user_id % 8 AS bucket, {_VAGG}
    FROM base
    WHERE event_type = 'click' AND cents >= {_KEEP_CENTS}
    GROUP BY user_id % 8
    ORDER BY bucket
"""


def dl5_delta_optimize_invariance(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """OPTIMIZE is motion, not change: after three data commits the
    table is bin-packed (optimize: remove+add with dataChange=False
    throughout), and the output reports (a) the post-optimize state
    per event type — must equal the pre-optimize union, which is what
    the oracle replays from events — and (b) the CDC rows of the
    optimize commit itself, which MUST be empty (a dataChange=True
    leak would add rows and break the row-count/hash compare). The
    per-run table is torn down afterwards (st9 discipline)."""
    import tempfile
    import uuid

    run = uuid.uuid4().hex[:12]
    table = os.path.join(tempfile.gettempdir(), f"sg_dl5_tbl_{run}")
    try:
        tbl = DeltaLogTable(table)
        base = _base(spark, sf_dir)
        tbl.overwrite(base.filter(F.col("_m") <= 4).drop("_m"))
        tbl.append(base.filter(F.col("_m").between(5, 7)).drop("_m"))
        tbl.append(base.filter(F.col("_m") >= 8).drop("_m"))
        n_files_before = len(tbl.live_files())
        v = tbl.optimize(spark)
        assert v == 3, "optimize did not commit"
        assert len(tbl.live_files()) == 1 < n_files_before

        agg = lambda df, phase: (
            df.groupBy("event_type")
            .agg(F.count("*").alias("n_rows"),
                 F.sum("cents").alias("cents_sum"))
            .select(F.lit(phase).alias("phase"), "*"))
        out = (agg(tbl.to_df(spark), "state")
               .unionByName(agg(tbl.table_changes(spark, v, v), "cdc"))
               .orderBy("phase", "event_type"))
        rows, out_schema = out.collect(), out.schema
    finally:
        shutil.rmtree(table, ignore_errors=True)
    return (spark.createDataFrame(rows, out_schema)
            .orderBy("phase", "event_type"))


QUERIES["dl5_delta_optimize_invariance"] = dl5_delta_optimize_invariance

ORACLES["dl5_delta_optimize_invariance"] = f"""
    {_SCRIPT_CTES}
    SELECT 'state' AS phase, event_type, {_PAGG}
    FROM base GROUP BY event_type
    ORDER BY phase, event_type
"""


def _z_table(spark: SparkSession, sf_dir: str) -> DeltaLogTable:
    """Z-ordered twin of the script table: full base overwrite, then
    OPTIMIZE ZORDER BY (user_id, cents) into 8 Z-contiguous files —
    built once per corpus fingerprint, staged + atomic rename."""
    src = os.path.join(sf_dir, "events.parquet")
    st = os.stat(src)
    fp = hashlib.sha256(
        f"{src}|{st.st_size}|{st.st_mtime_ns}|zorder|"
        f"v{DELTA_SCRIPT_VERSION}".encode()).hexdigest()[:16]
    path = f"/tmp/sg_delta_zorder/{fp}"
    if not os.path.isdir(os.path.join(path, "_delta_log")):
        stage = f"{path}.build-{os.getpid()}"
        shutil.rmtree(stage, ignore_errors=True)
        tbl = DeltaLogTable(stage)
        tbl.overwrite(_base(spark, sf_dir).drop("_m"))
        v = tbl.optimize(spark, zorder_by=["user_id", "cents"],
                         n_files=8)
        assert v == 1, "zorder optimize did not commit"
        os.makedirs(os.path.dirname(path), exist_ok=True)
        try:
            os.rename(stage, path)
        except OSError:
            shutil.rmtree(stage, ignore_errors=True)  # lost the race
    return DeltaLogTable(path)


def dl6_delta_zorder_read(spark: SparkSession,
                          sf_dir: str) -> DataFrame:
    """Multi-dimensional data skipping through OPTIMIZE ZORDER BY:
    the table is Z-clustered on (user_id, cents), so BOTH the
    user-range predicate (low quarter of user ids) and the
    cents-range predicate (top 7/8 of the cents domain — the
    heavy low-cents mass sits below it) prune
    files via the stats envelope — a linear sort would serve only
    its leading column. Bounds derive from the corpus maxima with
    integer arithmetic (replayed as scalar subqueries in the
    oracle); pruning stays sound-for-supersets with the row filter
    re-applied, and the in-query assertion pins that the Z-layout
    actually dropped files."""
    tbl = _z_table(spark, sf_dir)
    mx = tbl.to_df(spark).agg(
        F.max("user_id").alias("u"), F.max("cents").alias("c")).first()
    u4, c8 = mx["u"] // 4, mx["c"] // 8
    prune = [("user_id", "<=", u4), ("cents", ">=", c8)]
    assert len(tbl.live_files(prune=prune)) < len(tbl.live_files()), \
        "z-order pruning was vacuous"
    return (tbl.to_df(spark, prune=prune)
            .filter((F.col("user_id") <= u4) & (F.col("cents") >= c8))
            .groupBy("event_type")
            .agg(F.count("*").alias("n_rows"),
                 F.countDistinct("user_id").alias("n_users"),
                 F.sum("cents").alias("cents_sum"))
            .orderBy("event_type"))


QUERIES["dl6_delta_zorder_read"] = dl6_delta_zorder_read

ORACLES["dl6_delta_zorder_read"] = f"""
    WITH base AS (
        SELECT event_id, user_id, event_type,
               CAST(floor(value * 100) AS BIGINT) AS cents
        FROM events
    ), bounds AS (
        SELECT CAST(max(user_id) // 4 AS BIGINT) AS u4,
               CAST(max(cents) // 8 AS BIGINT) AS c8
        FROM base
    )
    SELECT event_type, {_VAGG}
    FROM base, bounds
    WHERE user_id <= u4 AND cents >= c8
    GROUP BY event_type
    ORDER BY event_type
"""
