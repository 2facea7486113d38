"""E2 monitor shapers + serving semantics on the mining fixture,
including the reference's off-by-one / ordering quirks, plus the
streaming layer (gold refresh + event-time ops in batch mode)."""

from __future__ import annotations

import pytest

from mining_data_integration_spark import (
    core, fixtures, monitor, serving, streaming,
)
from mining_data_integration_spark.fixtures import MINER_A, MINER_B, MINER_C

A, B, C = MINER_A, MINER_B, MINER_C


@pytest.fixture(scope="module")
def tables(spark):
    return fixtures.mining_tables(spark)


@pytest.fixture(scope="module")
def golds(tables):
    return streaming.e1_gold_tables(tables)


class TestMonitor:
    def test_current_status(self, golds):
        row = monitor.current_status(golds["block_info"], n=3).collect()[0]
        # trailing-3 stacks heights: 4, 5, 6 with fees 4000, 6500, 6000
        assert row.tip_height == 6
        assert float(row.avg_burn_fee) == pytest.approx((4000 + 6500 + 6000) / 3)
        assert [int(p.sum_burn_fees) for p in row.burn_fee_points] == \
            [4000, 6500, 6000]

    def test_miner_table_head50(self, golds):
        rows = monitor.miner_table(golds["mining_info"], n=4).collect()
        assert [int(r.stacks_block_height) for r in rows] == [5, 4, 3, 2]

    def test_burn_fee_area_dense_and_monotone(self, golds):
        out = monitor.burn_fee_area(golds["block_info"], n=1000)
        rows = out.collect()
        by_addr: dict[str, list] = {}
        for r in rows:
            by_addr.setdefault(r.address, []).append(r)
        tip = max(int(r.stacks_block_height) for r in rows)
        assert tip == 6
        for addr, pts in by_addr.items():
            heights = [int(p.stacks_block_height) for p in pts]
            # dense: every height from first point to tip, no gaps (W4/W5)
            assert heights == list(range(heights[0], tip + 1))
            values = [float(p.cum_burn_fee) for p in pts]
            assert values == sorted(values)          # cumulative monotone
        # A's cumulative burn: commits at sbh 1(600),2(1100),3(1300),
        # 4(1900),5(1500),6(3300) -> cum 600,1700,3000,4900,6400,9700
        a_vals = [float(p.cum_burn_fee) for p in by_addr[A]]
        assert a_vals == [600, 1700, 3000, 4900, 6400, 9700]

    def test_winner_pie(self, golds):
        rows = monitor.winner_pie(golds["miner_info"]).collect()
        got = {r.address: r.number for r in rows if r.address}
        assert got[A] == 3 and got[B] == 2 and got[C] == 1


class TestServing:
    def test_tail_slice_off_by_one(self, spark):
        df = spark.range(10).withColumnRenamed("id", "h")
        # reference slice(-latest-1) keeps latest+1 rows (server.js:152)
        got = serving.tail_slice(df, 3, ["h"])
        assert got.count() == 4

    def test_paginate_and_range(self, spark):
        df = spark.range(1, 101).withColumnRenamed("id", "h")
        page2 = sorted(r.h for r in serving.paginate(df, 2, 10, ["h"]).collect())
        assert page2 == list(range(11, 21))
        sl = sorted(r.h for r in serving.range_slice(df, 5, 8, ["h"]).collect())
        assert sl == [5, 6, 7, 8]

    def test_rr_formula(self, golds):
        out = serving.with_rr(golds["miner_info"],
                              btc_price=50000.0, stx_price=0.5)
        got = {r.stx_address: r.RR for r in out.collect()}
        # A (bonus era threshold = default 8387, so all 3 wins are bonus):
        # earn = 3*2466*0.5 = 3699; cost = (6*35000 + 9700)*50000/1e8
        cost_a = (6 * 35000 + 9700) * 50000 / 1e8
        assert got[A] == pytest.approx(round(3699 / cost_a - 1, 3))

    def test_btc_total(self, golds):
        row = serving.btc_total(golds["miner_info"]).collect()[0]
        # total burned = 9700+5600+4800+2400 = 22500 sats
        assert float(row.btc_total) == pytest.approx(round(22500 / 1e8, 2), abs=1e-9)

    def test_staged_sync_gate(self, tables):
        row = serving.is_staged_synced(
            tables["staging_blocks"], tables["staging_blocks"]).collect()[0]
        assert row.can_mine and row.local_height == 5  # orphaned 6 excluded

    def test_head_slice_tip_first(self, golds):
        rows = serving.head_slice(
            golds["mining_info"], 2,
            [golds["mining_info"].stacks_block_height.desc()])
        assert [int(r.stacks_block_height) for r in rows.collect()] == [5, 4]


class TestReorg:
    def test_reorg_recompute_switches_fork(self, spark, tables, tmp_path):
        """ST5 (rpc.js:277-309 rerun per tick): a deeper fork arriving
        in bronze must flip the canonical chain on the next refresh —
        full-recompute semantics make the reorg just another batch."""
        from pyspark.sql import Row
        from mining_data_integration_spark import fixtures as FX
        from mining_data_integration_spark.schemas import BLOCK_HEADERS

        gold = str(tmp_path / "gold")
        streaming.refresh_once(tables, gold)
        before = spark.read.parquet(f"{gold}/mining_info")
        assert before.count() == 6            # s0..s5 canonical

        # reorg: extend the old orphan branch s3b (height 3, forked off
        # s2) with s4b..s6b -> new deepest tip at height 6; anchor the
        # new blocks at burn blocks 104-106 so winners re-map
        h = FX._h
        extra = [
            Row(burn_header_hash=FX.BH[104], block_hash=h("b4", 4),
                parent_block=FX.SH_ORPHAN, consensus_hash=FX.CH[104],
                block_height=4),
            Row(burn_header_hash=FX.BH[105], block_hash=h("b5", 5),
                parent_block=h("b4", 4), consensus_hash=FX.CH[105],
                block_height=5),
            Row(burn_header_hash=FX.BH[106], block_hash=h("b6", 6),
                parent_block=h("b5", 5), consensus_hash=FX.CH[106],
                block_height=6),
        ]
        new_headers = tables["block_headers"].unionByName(
            spark.createDataFrame(extra, BLOCK_HEADERS))
        reorged = dict(tables, block_headers=new_headers)
        streaming.refresh_once(reorged, gold)
        after = spark.read.parquet(f"{gold}/mining_info")
        rows = {int(r.stacks_block_height) for r in after.collect()}
        # new canonical: s0-s2, s3b, s4b-s6b. s3b anchors at the
        # non-canonical burn fork row, so it has no winning commit and
        # emits no row (reference index-miss guard, rpc.js:297-300);
        # heights 4-6 re-derive from burn blocks 104-106 — 105 had a
        # sentinel winner, so it drops too
        assert rows == {0, 1, 2, 4, 6}
        by_h = {int(r.stacks_block_height): r for r in after.collect()}
        # height 4 now wins via burn block 104's winner TX11 -> miner B
        assert by_h[4].stx_address == B
        # height 6 wins via burn block 106's winner TX15 -> miner A
        assert by_h[6].stx_address == A


class TestStreaming:
    def test_refresh_once_writes_gold(self, tables, tmp_path):
        gold_dir = str(tmp_path / "gold")
        streaming.refresh_once(tables, gold_dir)
        spark = tables["snapshots"].sparkSession
        mi = spark.read.parquet(f"{gold_dir}/miner_info")
        assert mi.count() == 4  # A, B, C, null-address group
        # second refresh overwrites atomically (same count, no append)
        streaming.refresh_once(tables, gold_dir)
        assert spark.read.parquet(f"{gold_dir}/miner_info").count() == 4

    def test_stream_refresh_ticks(self, tables, tmp_path, spark):
        bronze = str(tmp_path / "bronze")
        gold = str(tmp_path / "gold2")
        tables["snapshots"].write.parquet(f"{bronze}/snapshots")
        q = streaming.stream_refresh(
            spark, bronze, gold, lambda s: tables,
            interval="1 seconds",
            checkpoint=str(tmp_path / "ckpt"))
        try:
            import time
            deadline = time.time() + 60
            ok = False
            while time.time() < deadline:
                try:
                    if spark.read.parquet(f"{gold}/mining_info").count() == 6:
                        ok = True
                        break
                except Exception:
                    pass
                time.sleep(1)
            assert ok, "gold tables not produced by streaming refresh"
        finally:
            q.stop()

    def test_tumbling_stream_equals_batch(self, spark, tmp_path):
        """The watermarked streaming aggregate must produce the same
        windows as its batch form once the stream is drained
        (availableNow trigger over the same parquet)."""
        from mining_data_integration_spark.io import read_table

        batch = read_table(spark, "/root/testdata/sf0.001", "events")
        expected = {
            (r.w_start, r.event_type, r.n)
            for r in streaming.tumbling_counts(batch).collect()
        }
        src = str(tmp_path / "events_stream")
        batch.write.parquet(src)
        stream = (
            spark.readStream.schema(batch.schema).parquet(src)
        )
        q = (
            streaming.tumbling_counts(stream)
            .writeStream.format("memory").queryName("tumbling_test")
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {
            (r.w_start, r.event_type, r.n)
            for r in spark.sql("SELECT * FROM tumbling_test").collect()
        }
        assert got == expected

    def test_session_window_stream_equals_batch(self, spark, tmp_path):
        """Stateful session windows drained through availableNow in
        complete mode must equal the batch session_window aggregate."""
        from mining_data_integration_spark.io import read_table

        batch = read_table(spark, "/root/testdata/sf0.001", "events")
        expected = sorted(
            (r.user_id, r.session_start, r.session_end, r.n_events)
            for r in streaming.session_windows(batch).collect())
        src = str(tmp_path / "events_sess")
        batch.write.parquet(src)
        stream = spark.readStream.schema(batch.schema).parquet(src)
        q = (
            streaming.session_windows(stream)
            .writeStream.format("memory").queryName("sess_eq_test")
            .outputMode("complete").trigger(availableNow=True).start()
        )
        q.awaitTermination(120)
        got = sorted(
            (r.user_id, r.session_start, r.session_end, r.n_events)
            for r in spark.sql("SELECT * FROM sess_eq_test").collect())
        assert got == expected

    def test_stateful_user_stats_across_batches(self, spark, tmp_path):
        """applyInPandasWithState must CARRY state across micro-batches:
        the source is split into two files with maxFilesPerTrigger=1, so
        every user seen in both halves proves the second batch merged
        into stored state. Final per-user row equals the batch
        aggregate."""
        import pytest as _pytest
        from pyspark.sql import functions as F

        from mining_data_integration_spark.io import read_table

        batch = read_table(spark, "/root/testdata/sf0.001", "events")
        expected = {
            r.user_id: (r.n, r.total, r.mx)
            for r in batch.groupBy("user_id").agg(
                F.count("*").alias("n"),
                F.sum(F.col("value").cast("double")).alias("total"),
                F.max(F.unix_micros("ts")).alias("mx"),
            ).collect()
        }
        src = str(tmp_path / "events_stateful")
        half = batch.count() // 2
        batch.limit(half).coalesce(1).write.parquet(src)
        batch.subtract(batch.limit(half)).coalesce(1) \
            .write.mode("append").parquet(src)
        stream = (
            spark.readStream.schema(batch.schema)
            .option("maxFilesPerTrigger", 1).parquet(src)
        )
        q = (
            streaming.stateful_user_stats(stream)
            .writeStream.format("memory").queryName("stateful_test")
            .outputMode("update").trigger(availableNow=True).start()
        )
        q.awaitTermination(120)
        # update mode appends one row per key per batch; the row with
        # the max n_events per key is the final state
        final = {
            r.user_id: (r.n_events, r.total_value, r.max_ts_us)
            for r in spark.sql(
                "SELECT user_id, n_events, total_value, max_ts_us, "
                "row_number() OVER (PARTITION BY user_id "
                "ORDER BY n_events DESC) AS rk FROM stateful_test"
            ).filter("rk = 1").collect()
        }
        assert set(final) == set(expected)
        for uid, (n, total, mx) in expected.items():
            assert final[uid][0] == n
            assert final[uid][1] == _pytest.approx(total, rel=1e-9)
            assert final[uid][2] == mx

    def test_stream_stream_band_join_equals_batch(self, spark, tmp_path):
        """Stream-stream join with event-time bounds, drained via
        availableNow, must produce exactly the batch join's pairs."""
        from pyspark.sql import functions as F

        from mining_data_integration_spark.io import read_table

        ev = read_table(spark, "/root/testdata/sf0.001", "events")
        purchases = ev.filter(F.col("event_type") == "purchase")
        errors = ev.filter(F.col("event_type") == "error")
        expected = sorted(
            (r.l_event_id, r.r_event_id)
            for r in streaming.stream_stream_band_join(
                purchases, errors).collect())
        assert expected, "fixture produced no band-join pairs"

        lsrc, rsrc = str(tmp_path / "ss_l"), str(tmp_path / "ss_r")
        purchases.write.parquet(lsrc)
        errors.write.parquet(rsrc)
        sl = spark.readStream.schema(purchases.schema).parquet(lsrc)
        sr = spark.readStream.schema(errors.schema).parquet(rsrc)
        q = (
            streaming.stream_stream_band_join(sl, sr)
            .writeStream.format("memory").queryName("ss_band_test")
            .outputMode("append").trigger(availableNow=True).start()
        )
        q.awaitTermination(120)
        got = sorted(
            (r.l_event_id, r.r_event_id)
            for r in spark.sql("SELECT * FROM ss_band_test").collect())
        assert got == expected

    def test_monitor_integrate_sections(self, golds):
        out = monitor.monitor_integrate(golds)
        assert set(out) == {"current_status", "miner_table",
                            "burn_fee_area", "winner_pie", "rr"}
        assert out["rr"].count() == 0            # dead endpoint parity
        assert out["current_status"].collect()[0].tip_height == 6

    def test_trailing_miner_info(self, tables):
        # last 3 stacks blocks = heights 4..6 -> burn blocks 103-106
        out = serving.trailing_miner_info(tables, 2)
        got = {r.stx_address: r for r in out.collect()}
        # commits in range: TX7(C),TX8(A),TX11(B),TX12(null),TX14(A),
        # TX15(A),TX16(C) at stacks heights 4,4,5,5,5,6,6
        assert int(got[A]["total_mined"]) == 3
        assert int(got[C]["total_mined"]) == 2
        assert int(got[B]["total_mined"]) == 1

    def test_streaming_dedup_batch_form(self, spark):
        df = spark.createDataFrame(
            [(1, "a"), (1, "b"), (2, "c")], "event_id long, x string")
        assert streaming.streaming_dedup(df).count() == 2
