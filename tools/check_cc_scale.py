"""Large-scale connected-components verification via a CLOSED-FORM
synthetic graph (round-9 VERDICT #5, mirroring check_walk_scale.py).

The g3/g4 DuckDB oracles replay contraction/propagation rounds as
chained CTEs, which caps the depth they can certify. This tool closes
the scale gap WITHOUT any round replay: it builds an edge list whose
component assignment is pure arithmetic on the node id —

  * nodes 0..n-1; node i belongs to block i // span
  * inside each block the nodes form one PATH (i, i+1) — so every
    component is a chain of diameter span-1, and the component id is
    closed-form: comp(i) = (i // span) * span (the block minimum)
  * every 7th block additionally gets bridge edges from its minimum
    to a few interior nodes (pure arithmetic), adding cycles and
    duplicate connectivity without changing the components

With span=1500 the min-label kernel would need ~1500 rounds per
block (far past its max_rounds=50 abort), while star contraction
converges in O(log span) — both the deep case for g4's kernel and,
with span=4, the shallow case g3's kernel handles, are checked
against the closed-form assignment hashed in DuckDB on the SAME
parquet file.

Usage: python tools/check_cc_scale.py [n_edges]   (default 150000)
"""

from __future__ import annotations

import hashlib
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_EDGES = int(sys.argv[1]) if len(sys.argv) > 1 else 150_000


def build_edges(n_nodes: int, span: int) -> list[tuple[int, int]]:
    """Path-per-block + arithmetic bridges. comp(i) = (i//span)*span."""
    edges = [(i, i + 1) for i in range(n_nodes - 1)
             if (i + 1) % span != 0]
    for b0 in range(0, n_nodes, span * 7):  # every 7th block: bridges
        top = min(b0 + span, n_nodes)
        for k in (span // 3, (2 * span) // 3):
            if b0 + k + 1 < top:
                edges.append((b0, b0 + k + 1))
    return edges


def check(spark, con, name: str, n_nodes: int, span: int,
          kernel) -> bool:
    edges = build_edges(n_nodes, span)
    tmp = tempfile.mkdtemp(prefix="sg_cc_scale_")
    try:
        path = f"{tmp}/edges.parquet"
        spark.createDataFrame(edges, "u long, v long") \
            .repartition(32).write.mode("overwrite").parquet(path)
        # closed-form oracle: comp(i) = (i // span) * span, no rounds
        want = con.execute(f"""
            SELECT (n // {span}) * {span} AS comp, n FROM (
                SELECT DISTINCT n FROM (
                    SELECT u AS n FROM read_parquet('{path}/*.parquet')
                    UNION ALL
                    SELECT v FROM read_parquet('{path}/*.parquet')
                )
            ) ORDER BY n
        """).fetchall()
        want_hash = hashlib.sha256(
            "\n".join(f"{c}|{n}" for c, n in want).encode()).hexdigest()
        t0 = time.time()
        rounds: list[int] = []
        df = spark.read.parquet(path)
        try:
            got = sorted((r.component, r.node)
                         for r in kernel(df, rounds).collect())
        except Exception as ex:
            print(f"FAIL  {name}: {type(ex).__name__}: {ex}")
            return False
        got_hash = hashlib.sha256(
            "\n".join(f"{c}|{n}" for c, n in got).encode()).hexdigest()
        ok = got_hash == want_hash
        rtxt = f" rounds={rounds[0]}" if rounds else ""
        print(f"{'PASS' if ok else 'FAIL'}  {name}: {len(got)} nodes, "
              f"{len(edges)} edges, span {span},{rtxt} "
              f"hash={'match' if ok else 'MISMATCH'} "
              f"({time.time() - t0:.1f}s)")
        return ok
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def check_bfs(spark, con, name: str, n_nodes: int, span: int,
              rounds: int) -> bool:
    """Closed-form BFS certification (round 11, the g5 kernel): seed
    the minimum of every NON-bridged block (blocks are disconnected
    from each other, and skipping the bridged ones keeps every
    reached distance pure arithmetic): node i in a seeded block is
    reached iff i % span <= rounds, at hops = i % span. Certifies the
    frontier kernel at depth `rounds` with thousands of concurrent
    seeds and no round replay."""
    from mining_data_integration_spark.operators.graph import bfs_hops

    edges = build_edges(n_nodes, span)
    tmp = tempfile.mkdtemp(prefix="sg_bfs_scale_")
    try:
        path = f"{tmp}/edges.parquet"
        spark.createDataFrame(edges, "u long, v long") \
            .repartition(32).write.mode("overwrite").parquet(path)
        want = con.execute(f"""
            SELECT n, n % {span} AS hops FROM (
                SELECT DISTINCT n FROM (
                    SELECT u AS n FROM read_parquet('{path}/*.parquet')
                    UNION ALL
                    SELECT v FROM read_parquet('{path}/*.parquet')
                )
            )
            WHERE (n // {span}) % 7 != 0 AND n % {span} <= {rounds}
            ORDER BY n
        """).fetchall()
        want_hash = hashlib.sha256(
            "\n".join(f"{n}|{h}" for n, h in want).encode()).hexdigest()
        t0 = time.time()
        df = spark.read.parquet(path)
        from pyspark.sql import functions as F
        seeds = (
            df.select(F.col("u").alias("n"))
            .union(df.select(F.col("v").alias("n"))).distinct()
            .filter((F.col("n") % span == 0)
                    # integer div: matches the oracle's // closed form
                    # by construction (double-division rounding could
                    # cross an integer boundary for large n)
                    & (F.expr(f"n div {span}") % 7 != 0))
        )
        try:
            got = sorted((r.n, r.hops) for r in
                         bfs_hops(df, seeds, rounds=rounds).collect())
        except Exception as ex:
            print(f"FAIL  {name}: {type(ex).__name__}: {ex}")
            return False
        got_hash = hashlib.sha256(
            "\n".join(f"{n}|{h}" for n, h in got).encode()).hexdigest()
        ok = got_hash == want_hash
        print(f"{'PASS' if ok else 'FAIL'}  {name}: {len(got)} reached, "
              f"{len(edges)} edges, span {span}, depth {rounds}, "
              f"hash={'match' if ok else 'MISMATCH'} "
              f"({time.time() - t0:.1f}s)")
        return ok
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def check_kcore(spark, name: str, n_blocks: int, ring: int,
                tail: int, rounds: int) -> bool:
    """Closed-form k-core certification (round 13, the g6 kernel):
    n_blocks disjoint blocks, each a `ring`-cycle with a `tail`-chain
    pendant off its base node. At k=2 the tail dissolves within
    `tail` peels and the ring is the exact core — so with rounds >=
    tail, the survivor set is closed-form: n_blocks*ring nodes, every
    degree exactly 2, and the id-sum is pure arithmetic. Certifies
    the cascade at scale with zero oracle replay."""
    import time

    from pyspark.sql import functions as F

    from mining_data_integration_spark.operators.graph import kcore

    span = ring + tail
    ring_edges = [
        spark.range(n_blocks).crossJoin(
            spark.range(ring).withColumnRenamed("id", "i")
        ).select(
            (F.col("id") * span + F.col("i")).alias("u"),
            (F.col("id") * span + (F.col("i") + 1) % ring).alias("v"))
    ]
    tail_edges = [
        spark.range(n_blocks).crossJoin(
            spark.range(tail).withColumnRenamed("id", "j")
        ).select(
            (F.col("id") * span
             + F.when(F.col("j") == 0, 0)
             .otherwise(ring + F.col("j") - 1)).alias("u"),
            (F.col("id") * span + ring + F.col("j")).alias("v"))
    ]
    edges = ring_edges[0].union(tail_edges[0])
    t0 = time.time()
    core = kcore(edges, k=2, rounds=rounds)
    agg = core.agg(
        F.count("*").alias("n"),
        F.min("degree").alias("dmin"), F.max("degree").alias("dmax"),
        F.sum("n").alias("idsum")).first()
    want_n = n_blocks * ring
    want_idsum = (ring * span * n_blocks * (n_blocks - 1) // 2
                  + n_blocks * ring * (ring - 1) // 2)
    ok = (agg["n"] == want_n and agg["dmin"] == agg["dmax"] == 2
          and agg["idsum"] == want_idsum)
    print(f"{'PASS' if ok else 'FAIL'}  {name}: {agg['n']}/{want_n} "
          f"core nodes, degrees [{agg['dmin']},{agg['dmax']}], "
          f"idsum {'match' if agg['idsum'] == want_idsum else 'MISMATCH'} "
          f"({time.time() - t0:.1f}s)")
    return ok


def check_star_hub(spark, name: str, n_spokes: int, kernel) -> bool:
    """Adversarial HUB graph (round-14, VERDICT #7): ONE center node
    with n_spokes neighbors — the worst case for the window-min round
    formulation, whose Window.partitionBy(u) buffers the hub's whole
    raw neighbor list inside a single task (the old groupBy+join
    round had the same skew on the SMJ probe side, so this is a wash
    versus the pre-round-13 plan — but it was never exercised: the
    path-per-block builder above has max degree 3). The hub id sits
    ABOVE every spoke so large_star must actually rewire through it.
    Correctness is closed-form — every node's component is the global
    minimum, node 0 — and the window stage's row skew (max vs median
    rows per hash partition of the symmetrized frame, the exact frame
    the first round's Window consumes) is recorded so the one-task
    buffering stays a measured, documented bound (SCALE.md)."""
    import time

    from pyspark.sql import functions as F

    hub = n_spokes  # spokes 0..n-1, hub = n
    edges = spark.range(n_spokes).select(
        F.lit(hub).cast("long").alias("u"),
        F.col("id").cast("long").alias("v"))
    sym = edges.select("u", "v").union(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    # explicit width: AQE would coalesce the tiny shuffle to ONE
    # partition and mask the skew this probe exists to record
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    per = sorted(r["cnt"] for r in (
        sym.repartition(n_part, "u")
        .groupBy(F.spark_partition_id().alias("p"))
        .agg(F.count("*").alias("cnt")).collect()))
    med, mx = per[len(per) // 2], per[-1]
    t0 = time.time()
    rounds: list[int] = []
    try:
        got = kernel(edges, rounds).collect()
    except Exception as ex:
        print(f"FAIL  {name}: {type(ex).__name__}: {ex}")
        return False
    ok = (len(got) == n_spokes + 1
          and all(r.component == 0 for r in got)
          and {r.node for r in got} == set(range(n_spokes + 1)))
    rtxt = f" rounds={rounds[0]}" if rounds else ""
    print(f"{'PASS' if ok else 'FAIL'}  {name}: {len(got)} nodes, "
          f"1 hub x {n_spokes} spokes,{rtxt} window-stage rows/task "
          f"max={mx} median={med} (skew {mx / max(med, 1):.0f}x) "
          f"({time.time() - t0:.1f}s)")
    return ok


def main() -> int:
    import duckdb

    from mining_data_integration_spark.operators.components import (
        connected_components, connected_components_star)
    from mining_data_integration_spark.session import get_spark

    spark = get_spark("cc-scale")
    con = duckdb.connect()
    n_nodes = N_EDGES + 1

    def star(df, rounds):
        return connected_components_star(df, "u", "v",
                                         rounds_out=rounds)

    def minlabel(df, _rounds):
        return connected_components(df, "u", "v")

    ok = True
    # deep case: 1500-diameter chains — min-label's named scale-killer
    ok &= check(spark, con, "star_deep", n_nodes, 1500, star)
    # shallow case: span-4 blocks — both kernels must agree here
    ok &= check(spark, con, "star_shallow", n_nodes, 4, star)
    ok &= check(spark, con, "minlabel_shallow", n_nodes, 4, minlabel)
    # mid case: span-40 (min-label converges < its 50-round cap)
    ok &= check(spark, con, "star_mid", n_nodes, 40, star)
    ok &= check(spark, con, "minlabel_mid", n_nodes, 40, minlabel)
    # BFS (g5 kernel): depth-40 walk down 1500-span paths, and the
    # shallow many-seed case
    ok &= check_bfs(spark, con, "bfs_deep", n_nodes, 1500, 40)
    ok &= check_bfs(spark, con, "bfs_shallow", n_nodes, 4, 3)
    # k-core (g6 kernel): deep tails force a 10-peel cascade; the
    # shallow case exercises the common 2-round trim
    ok &= check_kcore(spark, "kcore_deep", 20_000, 40, 10, 10)
    ok &= check_kcore(spark, "kcore_shallow", 20_000, 40, 2, 2)
    # adversarial hub (round-14 VERDICT #7): 1 hub, 1e5 spokes —
    # the high-degree case the path-per-block builder never makes;
    # star contraction (g4) AND min-label (g3, diameter 2) both
    # certified against the closed form comp(i) = 0
    ok &= check_star_hub(spark, "star_hub", 100_000, star)
    ok &= check_star_hub(spark, "minlabel_hub", 100_000,
                         lambda df, _r: minlabel(df, _r))
    print("ALL PASS" if ok else "FAILURES PRESENT")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
