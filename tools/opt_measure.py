"""Round-13 optimization measurement harness (guide §1).

For each named query: time the EAGER phase (the fn(spark, sf_dir)
call itself — k-means trains, index builds, stream drains run here),
then the lazy side with the noop sink (guide §1.4 — computes every
column, no sink cost), median of N; count the Spark jobs each phase
launches (statusTracker over a job group), and dump
`.explain("formatted")` to plans/r13/<name>_<tag>.txt.

Usage:
    python tools/opt_measure.py <tag> <query> [query ...]
    SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS as bench.py.
    OPT_RUNS=3 timed runs (default 3).

Prints one JSON line per query:
  {"query", "eager_sec", "noop_sec" (median), "jobs_eager",
   "jobs_lazy", "runs"}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TAG = sys.argv[1]
NAMES = sys.argv[2:]
RUNS = int(os.environ.get("OPT_RUNS", "3"))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    import __spark_entry__ as entry

    from mining_data_integration_spark.session import get_spark

    spark = get_spark("opt-measure")
    sc = spark.sparkContext
    qs = entry.queries()
    plans_dir = os.environ.get("OPT_PLANS_DIR", "plans/r13")
    os.makedirs(plans_dir, exist_ok=True)

    for name in NAMES:
        fn = qs[name]
        # warm-up (parquet footers, JIT)
        df = fn(spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()

        eager_times, noop_times = [], []
        jobs_eager = jobs_lazy = 0
        for i in range(RUNS):
            grp = f"{name}-eager-{i}"
            sc.setJobGroup(grp, name)
            t0 = time.perf_counter()
            df = fn(spark, SF_DIR)
            eager_times.append(time.perf_counter() - t0)
            jobs_eager = len(sc.statusTracker().getJobIdsForGroup(grp))

            grp = f"{name}-lazy-{i}"
            sc.setJobGroup(grp, name)
            sc.setJobDescription(f"{name} noop")
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            noop_times.append(time.perf_counter() - t0)
            jobs_lazy = len(sc.statusTracker().getJobIdsForGroup(grp))
            sc.setJobDescription(None)

        plan_path = f"{plans_dir}/{name}_{TAG}.txt"
        with open(plan_path, "w") as fh:
            fh.write(df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution
                .ExplainMode.fromString("formatted")))

        print(json.dumps({
            "query": name,
            "eager_sec": round(sorted(eager_times)[len(eager_times) // 2], 3),
            "noop_sec": round(sorted(noop_times)[len(noop_times) // 2], 3),
            "jobs_eager": jobs_eager,
            "jobs_lazy": jobs_lazy,
            "runs": RUNS,
            "plan": plan_path,
        }), flush=True)


if __name__ == "__main__":
    main()
