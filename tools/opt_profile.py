"""Event-log profiler for one query (round-13 optimization, guide §1/§7).

Runs a named registry query with the Spark event log enabled, then
parses the log into a per-job timeline: job wall, sum of task time,
task count, and the DRIVER GAP before each job (time since the
previous job finished — planning / py4j / collect overhead lives
there).

Usage: python tools/opt_profile.py <query> [sf_dir]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NAME = sys.argv[1]
SF_DIR = sys.argv[2] if len(sys.argv) > 2 else os.environ.get(
    "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
EVDIR = "/tmp/sg_optprof_events"


def main() -> None:
    shutil.rmtree(EVDIR, ignore_errors=True)
    os.makedirs(EVDIR)
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")

    # PYSPARK_SUBMIT_ARGS confs apply at JVM launch, so get_spark's
    # own builder picks them up without any API games
    os.environ["PYSPARK_SUBMIT_ARGS"] = (
        f"--conf spark.eventLog.enabled=true "
        f"--conf spark.eventLog.compress=false "
        f"--conf spark.eventLog.dir={EVDIR} pyspark-shell")

    from mining_data_integration_spark import session as sess

    spark = sess.get_spark("opt-profile")
    assert spark.sparkContext.getConf().get(
        "spark.eventLog.enabled") == "true", \
        "event log did not take; session pre-existing?"

    import __spark_entry__ as entry

    fn = entry.queries()[NAME]
    # warm-up
    fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()

    t0 = time.perf_counter()
    df = fn(spark, SF_DIR)
    t_eager = time.perf_counter() - t0
    df.write.format("noop").mode("overwrite").save()
    t_total = time.perf_counter() - t0
    spark.sparkContext._jsc.sc().listenerBus().waitUntilEmpty()

    # parse the single event-log file
    evf = []
    for root, _dirs, files in os.walk(EVDIR):
        evf += [os.path.join(root, f) for f in files
                if "events" in f and not f.endswith(".crc")]
    assert len(evf) == 1, evf
    jobs: dict[int, dict] = {}
    stages: dict[int, dict] = {}
    if evf[0].endswith(".zstd"):
        import io
        import subprocess
        raw = subprocess.run(["zstd", "-dc", evf[0]],
                             capture_output=True, check=True).stdout
        fh_open = lambda: io.StringIO(raw.decode())  # noqa: E731
    else:
        fh_open = lambda: open(evf[0])  # noqa: E731
    with fh_open() as fh:
        for line in fh:
            ev = json.loads(line)
            k = ev.get("Event")
            if k == "SparkListenerJobStart":
                jobs[ev["Job ID"]] = {
                    "t0": ev["Submission Time"],
                    "desc": (ev.get("Properties") or {}).get(
                        "spark.job.description", "")[:60],
                    "stages": [s["Stage ID"]
                               for s in ev["Stage Infos"]],
                }
            elif k == "SparkListenerJobEnd":
                jobs[ev["Job ID"]]["t1"] = ev["Completion Time"]
            elif k == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                st = stages.setdefault(si["Stage ID"], {})
                nm = si["Stage Name"].split("\n")[0]
                st["name"] = nm.replace("/root/repo/mining_data_integration_spark/", "")[:90]
                st["tasks"] = si["Number of Tasks"]
            elif k == "SparkListenerTaskEnd":
                sid = ev["Stage ID"]
                st = stages.setdefault(sid, {})
                ti = ev["Task Info"]
                st["task_ms"] = st.get("task_ms", 0) + (
                    ti["Finish Time"] - ti["Launch Time"])

    order = sorted(jobs)
    prev_end = None
    print(f"{NAME}: eager={t_eager:.2f}s total={t_total:.2f}s "
          f"jobs={len(order)}")
    print(f"{'job':>4} {'gap_ms':>7} {'wall_ms':>8} {'task_ms':>8} "
          f"{'ntask':>5}  desc")
    for j in order:
        jo = jobs[j]
        if "t1" not in jo:
            continue
        gap = (jo["t0"] - prev_end) if prev_end else 0
        prev_end = jo["t1"]
        tms = sum(stages.get(s, {}).get("task_ms", 0)
                  for s in jo["stages"])
        nt = sum(stages.get(s, {}).get("tasks", 0)
                 for s in jo["stages"])
        names = " | ".join(
            f"s{s}:{stages[s].get('name', '?')[:70]}"
            f"({stages[s].get('tasks', 0)}t,"
            f"{stages[s].get('task_ms', 0)}ms)"
            for s in jo["stages"] if s in stages
            and stages[s].get("task_ms", 0) > 200)
        print(f"{j:>4} {gap:>7} {jo['t1'] - jo['t0']:>8} {tms:>8} "
              f"{nt:>5}  {jo['desc']} {names}")
    total_gap = sum(max(0, jobs[j]["t0"] - jobs[order[i - 1]]["t1"])
                    for i, j in enumerate(order) if i)
    total_wall = sum(jobs[j]["t1"] - jobs[j]["t0"] for j in order
                     if "t1" in jobs[j])
    print(f"sum job wall = {total_wall} ms; "
          f"sum inter-job driver gap = {total_gap} ms")


if __name__ == "__main__":
    main()
