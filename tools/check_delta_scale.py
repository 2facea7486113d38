"""Delta-log adapter scale check (the walk/CC/index scale-artifact
discipline applied to the table format's cost model).

The dl-family's entire value at 100 TB is WHICH costs stay bounded:

* time travel — reading version v scans the files live AT v, a cost
  frozen when v was committed, no matter how many commits follow;
* CDC — `table_changes(v, v)` reads the files the commit touched
  (O(churn)), never the table: the same ingest batch appended to a
  10x table yields the SAME change-scan;
* log replay — snapshot() parses at most `checkpoint_interval`
  commit JSONs past the newest checkpoint, so a long-lived key's
  read cost is flat in its commit count;
* OPTIMIZE — the live set lands on exactly `n_files` files however
  many small appends preceded it, and rows are preserved;
* Z-order pruning — the fraction of files a fixed-selectivity
  range predicate reads does NOT degrade toward 1 as the corpus
  grows 10x (the envelope stays proportionally tight).

All checks are file-count/log-level mechanics (deterministic);
the only data-sized Spark jobs are the builds themselves.

Usage: python tools/check_delta_scale.py [small_n] [factor]
Prints PASS/FAIL per check and ALL PASS at the end (exit 0 iff all).
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from mining_data_integration_spark.session import get_spark  # noqa: E402
from mining_data_integration_spark.sources.deltalog import (  # noqa: E402
    DeltaLogTable)

N_SMALL = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
FACTOR = int(sys.argv[2]) if len(sys.argv) > 2 else 10

failures: list[str] = []


def check(name: str, ok: bool, detail: str = "") -> None:
    print(f"{'PASS' if ok else 'FAIL'} {name}"
          + (f" — {detail}" if detail else ""))
    if not ok:
        failures.append(name)


def rows_df(spark, lo: int, hi: int):
    return spark.range(lo, hi).select(
        "id", (F.hash(F.col("id").cast("string")) % 1000).alias("v"))


def build(spark, n: int, path: str) -> tuple[DeltaLogTable, list[int]]:
    """5 equal appends; returns the table and per-version live-file
    counts recorded AS OF each commit."""
    t = DeltaLogTable(path, checkpoint_interval=4)
    live_at = []
    step = n // 5
    for i in range(5):
        t.append(rows_df(spark, i * step, (i + 1) * step))
        live_at.append(len(t.live_files()))
    return t, live_at


def main() -> int:
    spark = get_spark("delta-scale")
    root = tempfile.mkdtemp(prefix="sg_delta_scale_")
    try:
        small, small_live = build(spark, N_SMALL, f"{root}/s")
        big, big_live = build(spark, N_SMALL * FACTOR, f"{root}/b")

        # -- time travel: old versions' file counts are frozen -------
        tt_ok = all(
            len(t.live_files(version=v)) == rec[v]
            for t, rec in ((small, small_live), (big, big_live))
            for v in range(5))
        check("time_travel_cost_frozen", tt_ok,
              f"per-version live counts small={small_live} "
              f"big={big_live}")

        # -- CDC is O(churn), not O(table) ---------------------------
        batch = rows_df(spark, 10**9, 10**9 + 1_000).coalesce(1)
        vs = small.append(batch)
        vb = big.append(batch)
        cs = small.table_changes(spark, vs, vs)
        cb = big.table_changes(spark, vb, vb)
        fs = len(small.live_files()) - small_live[-1]
        fb = len(big.live_files()) - big_live[-1]
        check("cdc_scan_is_churn_bounded",
              cs.count() == cb.count() == 1_000 and fs == fb == 1,
              f"change rows {cs.count()}/{cb.count()}, "
              f"batch files small={fs} big={fb} (10x table, same scan)")

        # -- checkpointed replay is O(interval) ----------------------
        def replay_gap(t: DeltaLogTable) -> int:
            v = t.version()
            cp = t._checkpoint_at_or_before(v)
            return v - (cp if cp is not None else -1)

        check("log_replay_checkpoint_bounded",
              replay_gap(small) <= 4 and replay_gap(big) <= 4,
              f"commits past checkpoint small={replay_gap(small)} "
              f"big={replay_gap(big)} (interval 4)")

        # -- OPTIMIZE bin-packs to n_files regardless of history -----
        n_rows_before = big.to_df(spark).count()
        v = big.optimize(spark, n_files=1)
        check("optimize_bin_packs",
              v is not None and len(big.live_files()) == 1
              and big.to_df(spark).count() == n_rows_before,
              f"live files {len(big.live_files())}, rows preserved "
              f"{n_rows_before}")
        check("optimize_cdc_silent",
              big.table_changes(spark, v, v).count() == 0)

        # -- Z-order pruning fraction is scale-invariant -------------
        def z_frac(n: int, path: str) -> float:
            t = DeltaLogTable(path)
            c = max(2, int(n ** 0.5))
            df = spark.range(n).select(
                (F.col("id") / c).cast("long").alias("a"),
                (F.col("id") % c).alias("b"))
            t.overwrite(df)
            assert t.optimize(spark, zorder_by=["a", "b"],
                              n_files=16) is not None
            hi = (n // c - 1) // 8     # low-eighth range on axis a
            hit = len(t.live_files(prune=[("a", "<=", hi)]))
            return hit / len(t.live_files())

        f_small = z_frac(N_SMALL, f"{root}/zs")
        f_big = z_frac(N_SMALL * FACTOR, f"{root}/zb")
        check("zorder_prune_fraction_scale_invariant",
              f_big <= f_small + 0.25 and f_big < 0.8,
              f"files read for a 1/8 axis slice: small={f_small:.2f} "
              f"big={f_big:.2f} of the table")
    finally:
        shutil.rmtree(root, ignore_errors=True)

    print("ALL PASS" if not failures else f"FAILURES: {failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
