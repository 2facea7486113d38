"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line {"metric", "value", "unit", "queries", "sf"}.

The headline set spans the engine's operator families (scan, join, agg,
window, dedup, similarity, text) so the number tracks whole-engine
throughput, not one hot path. Execution is forced with a count() of the
result DataFrame — same as the driver's consumption pattern.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "a1_pricing_summary",     # flagship hash aggregate (TPC-H Q1 shape)
    "a6_order_rollup",        # groupBy + collect_list(struct)
    "j1_equi_join_chain",     # multi-table equi-join chain
    "j6_composite_key_join",  # composite-key broadcast join
    "j8_computed_key_join",   # join on computed key
    "w2_cumulative_sum",      # partitioned running window
    "w10_sessionize",         # session windows over events
    "o7_offset_pagination",   # global row_number slice (range-sharded)
    "w14_scalable_cumsum",    # global running sum, two-phase sharded
    "j14_band_join",          # bucketed range join on events
    "a15_salted_group_agg",   # skew-salted two-stage aggregate
    "dd1_exact_dedup",        # content-hash dedup
    "dd3_minhash_lsh",        # MinHash LSH candidate pairs
    "sim1_cosine_topk",       # brute-force cosine top-k
    "tx2_quality_score",      # text quality scoring
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0)

    from mining_data_integration_spark.session import get_spark
    import __spark_entry__ as entry_mod

    spark = get_spark("bench")
    queries = entry_mod.queries()

    per_query: dict[str, float] = {}
    for name in HEADLINE:
        fn = queries[name]
        fn(spark, sf_dir).count()  # warm: parquet footer + JIT paths
        # median of 3 timed runs: GC pauses on this box swing single
        # runs by 2-3x on the hash-heavy queries
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            times.append(time.perf_counter() - t0)
        per_query[name] = round(sorted(times)[1], 3)

    total = round(sum(per_query.values()), 3)
    print(json.dumps({
        "metric": "headline_suite_wall",
        "value": total,
        "unit": "sec",
        "queries": per_query,
        "sf": sf,
    }))


if __name__ == "__main__":
    main()
