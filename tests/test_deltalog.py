"""Delta-log gold adapter (round-12 VERDICT missing #1): ACID commits,
time travel, optimistic concurrent writers, checkpoint replay, vacuum —
and the e1 gold outputs byte-equal across BOTH backends (pointer-swap
kv.GoldStore and the Delta-protocol DeltaGoldStore)."""

from __future__ import annotations

import json
import os
import threading

import pytest

from mining_data_integration_spark import fixtures
from mining_data_integration_spark.sources import kv
from mining_data_integration_spark.sources.deltalog import (
    DeltaGoldStore, DeltaLogTable, gold_store)


@pytest.fixture(scope="module")
def tables(spark):
    return fixtures.mining_tables(spark)


def rows_of(df):
    return sorted(tuple(str(v) for v in r) for r in df.collect())


def shape_of(df):
    """(name, type) pairs — nullability is NOT table state here: a
    parquet scan always reports data columns nullable, for the
    pointer-swap and the delta-log backend alike."""
    return [(f.name, f.dataType.simpleString()) for f in df.schema.fields]


class TestDeltaLogTable:
    def test_overwrite_get_roundtrip_and_versions(self, spark, tmp_path):
        t = DeltaLogTable(str(tmp_path / "t"))
        assert t.overwrite(spark.range(5)) == 0
        assert rows_of(t.to_df(spark)) == rows_of(spark.range(5))
        assert t.overwrite(spark.range(9)) == 1
        assert t.overwrite(spark.range(3)) == 2
        assert t.to_df(spark).count() == 3
        # time travel: every superseded snapshot stays readable
        assert t.to_df(spark, version=0).count() == 5
        assert t.to_df(spark, version=1).count() == 9
        hist = t.history()
        assert [h["version"] for h in hist] == [0, 1, 2]
        assert all(h["operationParameters"]["mode"] == "overwrite"
                   for h in hist)

    def test_append_accumulates(self, spark, tmp_path):
        t = DeltaLogTable(str(tmp_path / "t"))
        t.overwrite(spark.range(4))
        t.append(spark.range(4, 10))
        assert rows_of(t.to_df(spark)) == rows_of(spark.range(10))

    def test_commit_zero_actions_are_protocol_shaped(self, spark,
                                                     tmp_path):
        t = DeltaLogTable(str(tmp_path / "t"))
        t.overwrite(spark.range(2))
        fp = os.path.join(str(tmp_path / "t"),
                          "_delta_log", f"{0:020d}.json")
        kinds = []
        with open(fp) as f:
            for line in f:
                a = json.loads(line)
                kinds.append(next(iter(a)))
                if "add" in a:
                    add = a["add"]
                    assert set(add) >= {"path", "partitionValues",
                                        "size", "modificationTime",
                                        "dataChange"}
                    assert os.path.exists(os.path.join(
                        str(tmp_path / "t"), add["path"]))
        assert kinds[0] == "commitInfo"
        assert "protocol" in kinds and "metaData" in kinds
        assert "add" in kinds

    def test_schema_comes_from_metadata_not_inference(self, spark,
                                                      tmp_path):
        from pyspark.sql import functions as F

        t = DeltaLogTable(str(tmp_path / "t"))
        df = spark.range(3).select(
            F.col("id"), F.lit("x").alias("s"),
            F.lit(1.5).alias("f"))
        t.overwrite(df)
        got = t.to_df(spark)
        assert shape_of(got) == shape_of(df)
        # empty overwrite: schema survives with zero data files
        t.overwrite(df.filter("id < 0"))
        got = t.to_df(spark)
        assert shape_of(got) == shape_of(df) and got.count() == 0

    def test_partitioned_writes_record_partition_values(self, spark,
                                                        tmp_path):
        from pyspark.sql import functions as F

        t = DeltaLogTable(str(tmp_path / "t"))
        df = spark.range(20).withColumn("b", F.expr("id % 3"))
        t.overwrite(df, partition_by=["b"])
        snap = t.snapshot()
        pvs = {a["partitionValues"]["b"] for a in snap["live"].values()}
        assert pvs == {"0", "1", "2"}
        got = t.to_df(spark)
        assert set(got.columns) == {"id", "b"}
        assert rows_of(got) == rows_of(df)

    def test_torn_precommit_write_is_invisible(self, spark, tmp_path):
        """A writer dying after data-file placement but before the
        commit JSON must leave readers on the old snapshot — the
        format-native version of the pointer-swap crash story."""
        t = DeltaLogTable(str(tmp_path / "t"))
        t.overwrite(spark.range(5))
        # die mid-overwrite: files staged into the table dir, no commit
        t._stage_files(spark.range(100), None)
        assert t.version() == 0
        assert t.to_df(spark).count() == 5
        # and the next real writer is unaffected
        t.overwrite(spark.range(7))
        assert t.to_df(spark).count() == 7
        # vacuum collects the orphaned garbage (retention 0 — this
        # test IS writer quiescence; the default window is tested in
        # test_vacuum_retention_protects_inflight_writer)
        before = sum(len(fs) for _, _, fs in os.walk(t.path))
        assert t.vacuum(retain_versions=1, retention_seconds=0) > 0
        after = sum(len(fs) for _, _, fs in os.walk(t.path))
        assert after < before
        assert t.to_df(spark).count() == 7

    def test_concurrent_overwrites_both_commit(self, spark, tmp_path):
        """The story the single-writer lease cannot offer: two racing
        snapshot-replace writers BOTH commit (distinct versions, loser
        retries past the winner); the final state is one writer's
        complete snapshot, never a mix, and no exception surfaces."""
        t = DeltaLogTable(str(tmp_path / "t"))
        t.overwrite(spark.range(1))
        errs, versions = [], {}

        def write(tag, df):
            try:
                versions[tag] = t.overwrite(df)
            except Exception as e:       # surface, don't swallow
                errs.append(e)

        a = spark.range(10, 20)
        b = spark.range(50, 55)
        ts = [threading.Thread(target=write, args=("a", a)),
              threading.Thread(target=write, args=("b", b))]
        for th in ts:
            th.start()
        for th in ts:
            th.join()
        assert not errs, errs
        assert sorted(versions.values()) == [1, 2]
        final = rows_of(t.to_df(spark))
        assert final in (rows_of(a), rows_of(b))
        winner = "a" if final == rows_of(a) else "b"
        assert versions[winner] == 2     # last committer wins
        # the racer's snapshot is still time-travelable
        loser_df = b if winner == "a" else a
        assert rows_of(t.to_df(spark, version=1)) == rows_of(loser_df)

    def test_concurrent_appends_all_land(self, spark, tmp_path):
        t = DeltaLogTable(str(tmp_path / "t"))
        t.overwrite(spark.range(0))
        errs = []

        def append(lo, hi):
            try:
                t.append(spark.range(lo, hi))
            except Exception as e:
                errs.append(e)

        ts = [threading.Thread(target=append, args=(i * 10, i * 10 + 10))
              for i in range(3)]
        for th in ts:
            th.start()
        for th in ts:
            th.join()
        assert not errs, errs
        assert rows_of(t.to_df(spark)) == rows_of(spark.range(30))

    def test_checkpoint_replay_and_log_truncation(self, spark, tmp_path):
        """After the interval-K checkpoint, a reader replays checkpoint
        + tail only — proven by deleting every pre-checkpoint JSON and
        reading anyway (what S3 log expiry does at scale)."""
        t = DeltaLogTable(str(tmp_path / "t"), checkpoint_interval=4)
        for i in range(1, 8):
            t.overwrite(spark.range(i))
        cp = os.path.join(t.log_dir, f"{4:020d}.checkpoint.parquet")
        assert os.path.exists(cp)
        with open(os.path.join(t.log_dir, "_last_checkpoint")) as f:
            assert json.load(f)["version"] == 4
        want = rows_of(t.to_df(spark))
        for v in range(4):
            os.unlink(os.path.join(t.log_dir, f"{v:020d}.json"))
        assert rows_of(t.to_df(spark)) == want
        assert t.to_df(spark, version=5).count() == 6
        # and commits continue past the truncated prefix
        t.overwrite(spark.range(42))
        assert t.to_df(spark).count() == 42

    def test_vacuum_respects_retention(self, spark, tmp_path):
        t = DeltaLogTable(str(tmp_path / "t"))
        for i in (5, 6, 7, 8):
            t.overwrite(spark.range(i))
        assert t.vacuum(retain_versions=1, retention_seconds=0) > 0
        assert t.to_df(spark).count() == 8          # current intact
        assert t.to_df(spark, version=2).count() == 7   # retained
        with pytest.raises(Exception):
            t.to_df(spark, version=0).collect()     # vacuumed away

    def test_vacuum_retention_protects_inflight_writer(self, spark,
                                                       tmp_path):
        """ADVICE r12: data files land in the table dir BEFORE the
        commit, so a vacuum racing an in-flight writer must not delete
        its fresh staged-but-uncommitted files — the default
        modification-time window (Delta's deletedFileRetentionDuration
        shape) is what protects them."""
        t = DeltaLogTable(str(tmp_path / "t"))
        t.overwrite(spark.range(5))
        adds = t._stage_files(spark.range(100), None)  # in-flight
        assert t.vacuum(retain_versions=0) == 0        # default window
        for a in adds:
            assert os.path.exists(os.path.join(t.path, a["path"]))
        # the in-flight writer can still commit its staged files
        assert t._try_commit(1, [{"commitInfo": {}}]
                             + [{"add": a} for a in adds])
        assert t.to_df(spark).count() == 105
        # quiescent GC still collects true garbage
        t._stage_files(spark.range(3), None)
        assert t.vacuum(retain_versions=0, retention_seconds=0) > 0
        assert t.to_df(spark).count() == 105

    def test_append_schema_mismatch_raises(self, spark, tmp_path):
        """ADVICE r12: the protocol enforces schema compatibility on
        append — a differing schema must refuse, not silently commit a
        replacement metaData that null-fills old files on read."""
        from pyspark.sql import functions as F

        from mining_data_integration_spark.sources.deltalog import (
            SchemaMismatchError)

        t = DeltaLogTable(str(tmp_path / "t"))
        t.overwrite(spark.range(4))
        wide = spark.range(4, 6).withColumn("s", F.lit("x"))
        with pytest.raises(SchemaMismatchError):
            t.append(wide)
        # refused append leaves no garbage and no new version
        assert t.version() == 0
        assert t.vacuum(retain_versions=0, retention_seconds=0) == 0
        assert t.to_df(spark).count() == 4
        # overwrite MAY replace the schema; appends then conform
        t.overwrite(wide)
        t.append(spark.range(6, 8).withColumn("s", F.lit("y")))
        assert t.to_df(spark).count() == 4

    def test_append_nullability_compatibility(self, spark, tmp_path):
        """Raw schemaString equality is too strict (review r13):
        non-nullable data appends into a nullable column (table
        schema wins, no metaData replacement); nullable data into a
        non-null column refuses."""
        from pyspark.sql import functions as F

        from mining_data_integration_spark.sources.deltalog import (
            SchemaMismatchError)

        nullable_id = F.when(F.col("id") >= 0,
                             F.col("id")).alias("id")
        t = DeltaLogTable(str(tmp_path / "t"))
        t.overwrite(spark.range(3).select(nullable_id))
        t.append(spark.range(3, 5))            # non-null into nullable
        assert t.to_df(spark).count() == 5
        # no metaData replacement happened: schema is still nullable
        assert json.loads(
            t.snapshot()["metaData"]["schemaString"]
        )["fields"][0]["nullable"] is True
        t2 = DeltaLogTable(str(tmp_path / "t2"))
        t2.overwrite(spark.range(3))            # id non-nullable
        with pytest.raises(SchemaMismatchError):
            t2.append(spark.range(3, 5).select(nullable_id))

    def test_append_merge_schema_widens(self, spark, tmp_path):
        """append(merge_schema=True): new columns widen the table
        schema (Delta mergeSchema) — old files null-fill on read, the
        table identity (metaData id) survives, and CDC reads replay
        old commits with the evolved schema."""
        from pyspark.sql import functions as F

        t = DeltaLogTable(str(tmp_path / "t"))
        t.overwrite(spark.range(3))
        id0 = t.snapshot()["metaData"]["id"]
        with pytest.raises(Exception):
            t.append(spark.range(3, 5).withColumn("s", F.lit("x")))
        t.append(spark.range(3, 5).withColumn("s", F.lit("x")),
                 merge_schema=True)
        df = t.to_df(spark)
        assert [f.name for f in df.schema.fields] == ["id", "s"]
        got = {r["id"]: r["s"] for r in df.collect()}
        assert got == {0: None, 1: None, 2: None, 3: "x", 4: "x"}
        assert t.snapshot()["metaData"]["id"] == id0
        # CDC spanning the evolution reads old commits with the
        # evolved (v_to) schema: pre-evolution rows null-fill
        ch = t.table_changes(spark, 0).collect()
        assert {r["s"] for r in ch if r["_commit_version"] == 0} \
            == {None}
        assert {r["s"] for r in ch if r["_commit_version"] == 1} \
            == {"x"}

    def test_append_merge_schema_conflict_and_subset(self, spark,
                                                     tmp_path):
        """mergeSchema adds columns, never retypes: a type conflict
        refuses (and unstages cleanly); a SUBSET append under
        merge_schema lands with the missing nullable column
        null-filled."""
        from pyspark.sql import functions as F

        from mining_data_integration_spark.sources.deltalog import (
            SchemaMismatchError)

        t = DeltaLogTable(str(tmp_path / "t"))
        t.overwrite(spark.range(3).withColumn("s", F.lit("x")))
        with pytest.raises(SchemaMismatchError):
            t.append(spark.range(3, 5).withColumn("s", F.lit(7)),
                     merge_schema=True)
        assert t.version() == 0
        assert t.vacuum(retain_versions=0, retention_seconds=0) == 0
        t.append(spark.range(3, 5), merge_schema=True)  # no "s" col
        got = {r["id"]: r["s"] for r in t.to_df(spark).collect()}
        assert got == {0: "x", 1: "x", 2: "x", 3: None, 4: None}

    def test_table_changes_file_level_cdc(self, spark, tmp_path):
        """table_changes: appends surface as exact row-level inserts;
        an overwrite surfaces as delete-of-previous-state +
        insert-of-new-state (file granularity, what the log records);
        ranges are inclusive and validated."""
        t = DeltaLogTable(str(tmp_path / "t"))
        t.overwrite(spark.range(0, 3))      # v0
        t.append(spark.range(3, 5))         # v1
        t.overwrite(spark.range(10, 12))    # v2

        ch = t.table_changes(spark, 1, 1).collect()
        assert {(r["id"], r["_change_type"], r["_commit_version"])
                for r in ch} == {(3, "insert", 1), (4, "insert", 1)}

        ch = t.table_changes(spark, 1, 2)
        got = {(r["id"], r["_change_type"], r["_commit_version"])
               for r in ch.collect()}
        assert got == ({(i, "delete", 2) for i in range(5)}
                       | {(3, "insert", 1), (4, "insert", 1),
                          (10, "insert", 2), (11, "insert", 2)})

        assert t.table_changes(spark, 0, 0).count() == 3
        with pytest.raises(ValueError):
            t.table_changes(spark, 2, 1)
        with pytest.raises(ValueError):
            t.table_changes(spark, 0, 99)

    def test_txn_idempotent_append(self, spark, tmp_path):
        """The protocol's streaming exactly-once primitive: an append
        carrying txn=(app, version) replayed at the same (or an
        older) version is a no-op — no new commit, no duplicate rows,
        no staged garbage — while a higher version lands. Checkpoints
        preserve the txn state through log truncation."""
        t = DeltaLogTable(str(tmp_path / "t"), checkpoint_interval=3)
        t.overwrite(spark.range(3))
        assert t.txn_version("app") == -1
        t.append(spark.range(3, 5), txn=("app", 0))
        assert t.txn_version("app") == 0
        v = t.version()
        t.append(spark.range(3, 5), txn=("app", 0))   # retry replay
        assert t.version() == v
        assert t.to_df(spark).count() == 5
        assert t.vacuum(retain_versions=0, retention_seconds=0) == 0
        t.append(spark.range(5, 6), txn=("app", 1))   # next batch
        assert t.to_df(spark).count() == 6
        assert t.txn_version("app") == 1
        # another app's counter is independent
        assert t.txn_version("other") == -1
        t.append(spark.range(6, 7), txn=("other", 5))
        assert (t.txn_version("app"), t.txn_version("other")) == (1, 5)
        # checkpoint at v3 happened (interval 3); expire the JSON
        # prefix — txn state must survive via checkpoint replay
        assert t._checkpoint_at_or_before(t.version()) is not None
        cp = t._checkpoint_at_or_before(t.version())
        for old in range(cp):
            os.unlink(os.path.join(t.log_dir, f"{old:020d}.json"))
        assert t.txn_version("app") == 1
        assert t.txn_version("other") == 5
        t.append(spark.range(7, 8), txn=("other", 5))  # still a no-op
        assert t.to_df(spark).count() == 7

    def test_data_skipping_prunes_files_by_stats_and_partition(
            self, spark, tmp_path):
        """live_files/to_df prune: data columns skip on the footer
        min/max stats envelope, partition columns on the directory
        value; missing information never prunes (sound-for-supersets:
        a pruned read plus the row filter equals the full read plus
        the row filter)."""
        from pyspark.sql import functions as F

        t = DeltaLogTable(str(tmp_path / "t"))
        t.overwrite(spark.range(0, 5).coalesce(1))
        t.append(spark.range(100, 105).coalesce(1))
        assert len(t.live_files()) == 2
        assert len(t.live_files(prune=[("id", ">=", 100)])) == 1
        assert len(t.live_files(prune=[("id", "<=", 4)])) == 1
        assert len(t.live_files(prune=[("id", "=", 50)])) == 0
        assert len(t.live_files(prune=[("id", "=", 102)])) == 1
        # unknown column -> no pruning
        assert len(t.live_files(prune=[("nope", "=", 1)])) == 2
        got = (t.to_df(spark, prune=[("id", ">=", 100)])
               .filter(F.col("id") >= 100).count())
        assert got == 5

        p = DeltaLogTable(str(tmp_path / "p"))
        df = spark.range(10).withColumn(
            "k", F.when(F.col("id") < 5, "a").otherwise("b"))
        p.overwrite(df, partition_by=["k"])
        all_files = p.live_files()
        a_files = p.live_files(prune=[("k", "=", "a")])
        assert 0 < len(a_files) < len(all_files)
        assert all(f["partitionValues"]["k"] == "a" for f in a_files)
        got = {r.id for r in p.to_df(
            spark, prune=[("k", "=", "a")]).filter("k = 'a'").collect()}
        assert got == set(range(5))

    def test_optimize_is_invisible_to_cdc(self, spark, tmp_path):
        """OPTIMIZE: bin-packs the live set (fewer files), commits
        with dataChange=False everywhere — same rows, no CDC rows,
        old files vacuum-collectable afterwards."""
        t = DeltaLogTable(str(tmp_path / "t"))
        t.overwrite(spark.range(0, 4))
        t.append(spark.range(4, 8))
        t.append(spark.range(8, 12))
        before = rows_of(t.to_df(spark))
        n_before = len(t.live_files())
        v = t.optimize(spark)
        assert v == 3
        assert len(t.live_files()) == 1 < n_before
        assert rows_of(t.to_df(spark)) == before
        assert t.table_changes(spark, v, v).count() == 0
        # data commits before it still replay
        assert t.table_changes(spark, 1, 1).count() == 4
        assert t.vacuum(retain_versions=0, retention_seconds=0) > 0
        assert rows_of(t.to_df(spark)) == before

    def test_optimize_zorder_prunes_both_dimensions(self, spark,
                                                    tmp_path):
        """OPTIMIZE ZORDER BY: after Z-clustering on (a, b), a range
        predicate on EITHER column prunes files — the property a
        linear sort only gives its leading column. Rows and CDC
        invisibility are unchanged from plain optimize."""
        from pyspark.sql import functions as F

        t = DeltaLogTable(str(tmp_path / "t"))
        df = spark.range(256).select(
            (F.col("id") / 16).cast("long").alias("a"),
            (F.col("id") % 16).alias("b"))
        t.overwrite(df.coalesce(1))
        before = rows_of(t.to_df(spark))
        v = t.optimize(spark, zorder_by=["a", "b"], n_files=4)
        assert v == 1
        assert len(t.live_files()) == 4
        assert rows_of(t.to_df(spark)) == before
        assert t.table_changes(spark, v, v).count() == 0
        # a in [0,3] is the low quarter of one axis; b likewise on
        # the other: both must prune strictly (Z-contiguous files
        # cover quadrants, not slabs)
        a_files = t.live_files(prune=[("a", "<=", 3)])
        b_files = t.live_files(prune=[("b", "<=", 3)])
        assert len(a_files) < 4 and len(b_files) < 4
        got = {(r.a, r.b) for r in
               t.to_df(spark, prune=[("b", "<=", 3)])
               .filter("b <= 3").collect()}
        assert got == {(a, b) for a in range(16) for b in range(4)}

    def test_optimize_aborts_on_concurrent_overwrite(self, spark,
                                                     tmp_path):
        """A racing overwrite invalidates the files optimize wants to
        swap — optimize must ABORT (never resurrect replaced data),
        and the winner's state survives untouched."""
        raced = {"done": False}

        class Racing(DeltaLogTable):
            def _try_commit(self, version, actions):
                is_opt = any(a.get("commitInfo", {}).get("operation")
                             == "OPTIMIZE" for a in actions)
                if is_opt and not raced["done"]:
                    raced["done"] = True
                    DeltaLogTable(self.path).overwrite(
                        spark.range(50, 55))
                return super()._try_commit(version, actions)

        t = Racing(str(tmp_path / "t"))
        t.overwrite(spark.range(5))
        t.append(spark.range(5, 8))
        assert t.optimize(spark) is None
        assert raced["done"]
        assert rows_of(t.to_df(spark)) == rows_of(spark.range(50, 55))
        # aborted optimize unstaged its rewrite: nothing uncommitted
        # left beyond the overwritten generation's own tombstones
        t.vacuum(retain_versions=0, retention_seconds=0)
        assert rows_of(t.to_df(spark)) == rows_of(spark.range(50, 55))

    def test_history_survives_log_truncation(self, spark, tmp_path):
        """ADVICE r12: DESCRIBE HISTORY on a checkpoint-truncated log
        returns the surviving suffix, not FileNotFoundError."""
        t = DeltaLogTable(str(tmp_path / "t"), checkpoint_interval=4)
        for i in range(1, 8):
            t.overwrite(spark.range(i))
        for v in range(4):
            os.unlink(os.path.join(t.log_dir, f"{v:020d}.json"))
        assert [h["version"] for h in t.history()] == [4, 5, 6]

    def test_add_stats_and_checkpoint_spec_columns(self, spark,
                                                   tmp_path):
        """Round-13 fidelity pass: add actions carry footer-derived
        stats (numRecords), and the checkpoint parquet has every
        top-level PROTOCOL.md column with the spec's add/metaData
        struct fields."""
        import pyarrow.parquet as pq

        t = DeltaLogTable(str(tmp_path / "t"), checkpoint_interval=2)
        t.overwrite(spark.range(10).coalesce(1))
        snap = t.snapshot()
        n_recs = [json.loads(a["stats"])["numRecords"]
                  for a in snap["live"].values()]
        assert sum(n_recs) == 10
        t.overwrite(spark.range(6).coalesce(1))
        t.overwrite(spark.range(7).coalesce(1))     # v2 -> checkpoint
        cp = pq.read_table(os.path.join(
            t.log_dir, f"{2:020d}.checkpoint.parquet"))
        assert set(cp.schema.names) >= {
            "txn", "add", "remove", "metaData", "protocol"}
        add_fields = {f.name for f in cp.schema.field("add").type}
        assert add_fields >= {"path", "partitionValues", "size",
                              "modificationTime", "dataChange",
                              "stats", "tags"}
        md_fields = {f.name for f in cp.schema.field("metaData").type}
        assert md_fields >= {"id", "name", "description", "format",
                             "schemaString", "partitionColumns",
                             "configuration", "createdTime"}
        # checkpoint replay preserves stats and still reads clean
        for v in (0, 1):
            os.unlink(os.path.join(t.log_dir, f"{v:020d}.json"))
        snap = t.snapshot()
        assert sum(json.loads(a["stats"])["numRecords"]
                   for a in snap["live"].values()) == 7
        assert t.to_df(spark).count() == 7


class TestDeltaGoldStore:
    def test_set_get_keyerror_parity_with_pointer_store(self, spark,
                                                        tmp_path):
        store = DeltaGoldStore(str(tmp_path / "gold"))
        store.set("k", spark.range(5))
        assert store.get(spark, "k").count() == 5
        store.set("k", spark.range(3))
        assert store.get(spark, "k").count() == 3
        assert store.get(spark, "k", version=0).count() == 5
        with pytest.raises(KeyError):
            store.get(spark, "missing")
        assert [h["version"] for h in store.history("k")] == [0, 1]

    def test_store_facade_passthroughs(self, spark, tmp_path):
        """The gold-store facade exposes the format-native extras
        (CDC, optimize, txn) so serving code never reaches into
        DeltaLogTable directly."""
        s = DeltaGoldStore(str(tmp_path / "g"))
        s.set("k", spark.range(4))
        t = s._table("k")
        t.append(spark.range(4, 6), txn=("tick", 7))
        assert s.txn_version("k", "tick") == 7
        assert s.table_changes(spark, "k", 1, 1).count() == 2
        assert s.optimize(spark, "k") == 2
        assert s.get(spark, "k").count() == 6

    def test_factory(self, tmp_path):
        assert isinstance(gold_store(str(tmp_path / "a"), "pointer"),
                          kv.GoldStore)
        assert isinstance(gold_store(str(tmp_path / "b"), "deltalog"),
                          DeltaGoldStore)
        with pytest.raises(ValueError):
            gold_store(str(tmp_path / "c"), "redis")

    @pytest.mark.parametrize("backend", ["pointer", "deltalog"])
    def test_stream_refresh_through_backend(self, spark, tables,
                                            tmp_path, backend):
        """Round-13 VERDICT #7: the st-family foreachBatch gold tick
        parameterized over BOTH GoldStore backends — a real
        Structured Streaming run whose per-tick writes go through
        store.set, outputs equal to the direct compute; the deltalog
        backend additionally versions every tick (time travel) and
        replaces the single-writer discipline with optimistic
        commits."""
        import time

        from mining_data_integration_spark import streaming
        from mining_data_integration_spark.streaming import (
            e1_gold_tables, refresh_once_store)

        bronze = str(tmp_path / "bronze")
        gold = str(tmp_path / "gold")
        tables["snapshots"].write.parquet(f"{bronze}/snapshots")
        store = gold_store(gold, backend)
        q = streaming.stream_refresh(
            spark, bronze, gold, lambda s: tables,
            interval="1 seconds",
            checkpoint=str(tmp_path / "ckpt"), backend=backend)
        try:
            deadline = time.time() + 60
            got = None
            while time.time() < deadline:
                try:
                    # poll for the LAST table the tick writes —
                    # stopping on the first would kill the batch
                    # mid-tick and flake the three-table assert below
                    got = store.get(spark, "block_info")
                    got.count()
                    break
                except Exception:
                    time.sleep(1)
            assert got is not None, "no gold tick landed"
        finally:
            q.stop()
        want = e1_gold_tables(tables)
        for name, df in want.items():
            assert rows_of(store.get(spark, name)) == rows_of(df), name
        if backend == "deltalog":
            # a second tick (same batch body the stream runs) bumps
            # the version; the first tick stays time-travelable
            refresh_once_store(tables, store)
            hist = store.history("miner_info")
            assert len(hist) >= 2
            assert rows_of(store.get(spark, "miner_info", version=0)) \
                == rows_of(want["miner_info"])

    @pytest.mark.parametrize("backend", ["pointer", "deltalog"])
    def test_e1_gold_outputs_roundtrip_per_backend(self, spark, tables,
                                                   tmp_path, backend):
        """The VERDICT done-bar: the e1 gold outputs written and read
        through EACH backend equal the direct compute."""
        from mining_data_integration_spark.streaming import (
            e1_gold_tables)

        store = gold_store(str(tmp_path / backend), backend)
        gold = e1_gold_tables(tables)
        for name, df in gold.items():
            store.set(name, df)
        for name, df in gold.items():
            got = store.get(spark, name)
            assert shape_of(got) == shape_of(df), name
            assert rows_of(got) == rows_of(df), name
