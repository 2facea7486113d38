"""Graph-analytics queries (beyond the reference's operator set).

g1 ranks the nation-level trade graph: edges supplier-nation ->
customer-nation weighted by lineitem count. The edge derivation is
the distributed part (lineitem JOIN orders JOIN customer JOIN
supplier — the same dimension-first reduction j1 declares); the
5-iteration fixed-point PageRank then runs over the tiny aggregated
edge list. The DuckDB oracle replays the identical integer iteration
through chained MATERIALIZED CTEs (MATERIALIZED is load-bearing:
default inlining re-evaluates the rank chain multiplicatively — the
sim16 lesson).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.graph import (PR_DAMP_DEN, PR_DAMP_NUM, PR_SCALE,
                               pagerank_fixedpoint)
from ._util import t

PR_ITERATIONS = 5


def g1_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-point PageRank over the supplier-nation -> customer-nation
    trade graph, 5 exact integer iterations (operators/graph.py)."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    s = t(spark, sf_dir, "supplier")
    edges = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .groupBy(
            s["s_nationkey"].cast("long").alias("src"),
            c["c_nationkey"].cast("long").alias("dst"),
        )
        .agg(F.count("*").cast("long").alias("w"))
    )
    ranks = pagerank_fixedpoint(edges, iterations=PR_ITERATIONS)
    return (ranks.select(F.col("n").alias("nation"),
                         F.col("r").alias("rank_fp"))
            .orderBy("nation"))


def _pr_oracle() -> str:
    scale, dn, dd = PR_SCALE, PR_DAMP_NUM, PR_DAMP_DEN
    teleport = f"(CAST({scale} AS BIGINT) * {dd - dn}) // {dd} // nn"
    steps = []
    prev = "r0"
    for i in range(1, PR_ITERATIONS + 1):
        steps.append(f"""
    , r{i} AS MATERIALIZED (
        SELECT nodes.n,
               CAST({teleport} + coalesce(t.s, 0) AS BIGINT) AS r
        FROM nodes CROSS JOIN nn LEFT JOIN (
            SELECT e.dst AS n2,
                   sum((((r.r * {dn}) // {dd}) * e.w) // o.wout) AS s
            FROM edges e
            JOIN {prev} r ON e.src = r.n
            JOIN out_w o ON e.src = o.src
            GROUP BY e.dst
        ) t ON nodes.n = t.n2
    )""")
        prev = f"r{i}"
    return f"""
    WITH edges AS MATERIALIZED (
        SELECT CAST(s.s_nationkey AS BIGINT) AS src,
               CAST(c.c_nationkey AS BIGINT) AS dst,
               CAST(count(*) AS BIGINT) AS w
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        GROUP BY 1, 2
    ), nodes AS MATERIALIZED (
        SELECT src AS n FROM edges UNION SELECT dst FROM edges
    ), out_w AS MATERIALIZED (
        SELECT src, CAST(sum(w) AS BIGINT) AS wout FROM edges GROUP BY src
    ), nn AS MATERIALIZED (
        SELECT count(*) AS nn FROM nodes
    ), r0 AS MATERIALIZED (
        SELECT n, CAST(CAST({scale} AS BIGINT) // nn AS BIGINT) AS r
        FROM nodes CROSS JOIN nn
    ){''.join(steps)}
    SELECT n AS nation, r AS rank_fp FROM {prev} ORDER BY nation
"""


QUERIES = {"g1_pagerank": g1_pagerank}
ORACLES = {"g1_pagerank": _pr_oracle()}


def g2_triangle_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact triangle census of the undirected nation trade graph (the
    g1 edge derivation, direction dropped): nodes, edges, wedges
    Σ C(deg,2), and triangles — counted once each via the
    degree-ordered edge orientation (operators/graph.triangle_stats,
    the O(m^1.5) algorithm that survives hub skew). All int64; the
    oracle replays the same orientation in SQL."""
    from ..operators.graph import triangle_stats

    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    s = t(spark, sf_dir, "supplier")
    pairs = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .select(s["s_nationkey"].cast("long").alias("a"),
                c["c_nationkey"].cast("long").alias("b"))
    )
    return triangle_stats(pairs)


QUERIES["g2_triangle_census"] = g2_triangle_census

ORACLES["g2_triangle_census"] = """
    WITH pairs AS MATERIALIZED (
        SELECT DISTINCT
               least(CAST(s.s_nationkey AS BIGINT),
                     CAST(c.c_nationkey AS BIGINT)) AS u,
               greatest(CAST(s.s_nationkey AS BIGINT),
                        CAST(c.c_nationkey AS BIGINT)) AS v
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        WHERE s.s_nationkey <> c.c_nationkey
    ), deg AS MATERIALIZED (
        SELECT n, CAST(count(*) AS BIGINT) AS d FROM (
            SELECT u AS n FROM pairs UNION ALL SELECT v FROM pairs
        ) GROUP BY n
    ), oriented AS MATERIALIZED (
        SELECT CASE WHEN (du, u) < (dv, v) THEN u ELSE v END AS src,
               CASE WHEN (du, u) < (dv, v) THEN v ELSE u END AS dst
        FROM pairs
        JOIN deg a ON pairs.u = a.n
        JOIN deg b ON pairs.v = b.n,
        LATERAL (SELECT a.d AS du, b.d AS dv) x
    ), tri AS (
        SELECT CAST(count(*) AS BIGINT) AS n_triangles
        FROM oriented o1
        JOIN oriented o2 ON o1.dst = o2.src
        JOIN oriented o3 ON o3.src = o1.src AND o3.dst = o2.dst
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM deg) AS n_nodes,
           (SELECT CAST(count(*) AS BIGINT) FROM pairs) AS n_edges,
           (SELECT CAST(sum(d * (d - 1) // 2) AS BIGINT) FROM deg)
               AS n_wedges,
           n_triangles
    FROM tri
"""


G3_ITERATIONS = 6


def g3_label_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components of the SPARSE part-supplier supply graph
    by synchronous min-label propagation (operators/graph.
    min_label_components, 6 BSP rounds — each one shuffle-join +
    groupBy-min): the bipartite graph keeps every (part, supplier)
    lineitem pair with (l_partkey*7 + l_suppkey) % 5 = 0, parts on
    even node ids and suppliers on odd, so unlike g1/g2's dense
    25-nation graph it genuinely fragments into supply islands.
    Output is the per-component rollup (size, part/supplier split,
    id range) a supply-chain or corpus-clustering report reads. The
    DuckDB oracle replays all 6 rounds in chained MATERIALIZED CTEs —
    the hash checks the exact label sequence, so it stays green at
    any k; convergence to true components on this graph is pinned
    separately by the unit test."""
    from ..operators.graph import min_label_components

    li = t(spark, sf_dir, "lineitem")
    edges = (
        li.filter((F.col("l_partkey") * 7 + F.col("l_suppkey")) % 5 == 0)
        .select((F.col("l_partkey").cast("long") * 2).alias("u"),
                (F.col("l_suppkey").cast("long") * 2 + 1).alias("v"))
        .distinct()
    )
    labels = min_label_components(edges, iterations=G3_ITERATIONS)
    return (
        labels.groupBy("comp")
        .agg(F.count("*").cast("long").alias("n_nodes"),
             F.sum((F.col("n") % 2 == 0).cast("long")).alias("n_parts"),
             F.sum((F.col("n") % 2 == 1).cast("long"))
             .alias("n_suppliers"),
             F.max("n").cast("long").alias("max_node"))
        .orderBy("comp")
    )


QUERIES["g3_label_components"] = g3_label_components


def _g3_oracle() -> str:
    steps = []
    prev = "r0"
    for i in range(1, G3_ITERATIONS + 1):
        steps.append(f"""
    , r{i} AS MATERIALIZED (
        SELECT p.n,
               least(p.comp, coalesce(t.m, p.comp)) AS comp
        FROM {prev} p LEFT JOIN (
            SELECT s.u, min(r.comp) AS m
            FROM sym s JOIN {prev} r ON s.v = r.n
            GROUP BY s.u
        ) t ON p.n = t.u
    )""")
        prev = f"r{i}"
    return f"""
    WITH edges AS MATERIALIZED (
        SELECT DISTINCT CAST(l_partkey AS BIGINT) * 2 AS u,
               CAST(l_suppkey AS BIGINT) * 2 + 1 AS v
        FROM lineitem
        WHERE (l_partkey * 7 + l_suppkey) % 5 = 0
    ), sym AS MATERIALIZED (
        SELECT u, v FROM edges UNION SELECT v, u FROM edges
    ), r0 AS MATERIALIZED (
        SELECT n, n AS comp FROM (
            SELECT DISTINCT u AS n FROM sym
        )
    ){''.join(steps)}
    SELECT comp, CAST(count(*) AS BIGINT) AS n_nodes,
           CAST(sum(CASE WHEN n % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_parts,
           CAST(sum(CASE WHEN n % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_suppliers,
           CAST(max(n) AS BIGINT) AS max_node
    FROM {prev} GROUP BY comp ORDER BY comp
"""


ORACLES["g3_label_components"] = _g3_oracle()


G4_ORACLE_ROUNDS = 12  # converged rounds measured 8 at sf0.001/0.01/0.1
G4_CHAIN_BASE = 1_000_000_000


def g4_star_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components by LARGE-STAR/SMALL-STAR contraction
    (operators/components.connected_components_star — O(log n)
    rounds, diameter-independent) over a graph built to defeat the
    O(diameter) min-label kernel: the g3 part-supplier bipartite
    islands UNION ~97-link chain segments over consecutive part keys
    in a disjoint id range (node = p_partkey + 1e9, segment broken at
    every multiple of 97). Min-label would need ~97 rounds per
    segment; star contraction converges in 8 at every sf tier
    (measured sf0.001/0.01/0.1). Output is the per-component rollup
    (size, part/supplier/chain split, id range).

    The DuckDB oracle replays 12 contraction rounds as chained
    MATERIALIZED CTEs (the g3 pattern): the converged star forest is
    a FIXED POINT of the (large-star ∘ small-star) round, so any
    replay count >= the kernel's convergence round reproduces the
    exact final edge set — 12 gives 4 rounds of margin over the
    measured 8, and the unit test pins convergence <= 10 on this
    derivation."""
    from ..operators.components import connected_components_star

    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    bip = (
        li.filter((F.col("l_partkey") * 7 + F.col("l_suppkey")) % 5 == 0)
        .select((F.col("l_partkey").cast("long") * 2).alias("u"),
                (F.col("l_suppkey").cast("long") * 2 + 1).alias("v"))
        .distinct()
    )
    mx = p.agg(F.max("p_partkey")).collect()[0][0]
    chain = (
        p.filter((F.col("p_partkey") % 97 != 0)
                 & (F.col("p_partkey") < mx))
        .select((F.col("p_partkey").cast("long") + G4_CHAIN_BASE)
                .alias("u"),
                (F.col("p_partkey").cast("long") + G4_CHAIN_BASE + 1)
                .alias("v"))
    )
    labels = connected_components_star(
        bip.unionByName(chain), "u", "v")
    B = G4_CHAIN_BASE
    return (
        labels.groupBy(F.col("component"))
        .agg(F.count("*").cast("long").alias("n_nodes"),
             F.sum(((F.col("node") < B) & (F.col("node") % 2 == 0))
                   .cast("long")).alias("n_parts"),
             F.sum(((F.col("node") < B) & (F.col("node") % 2 == 1))
                   .cast("long")).alias("n_suppliers"),
             F.sum((F.col("node") >= B).cast("long")).alias("n_chain"),
             F.max("node").cast("long").alias("max_node"))
        .orderBy("component")
    )


QUERIES["g4_star_components"] = g4_star_components


def star_rounds_sql(rounds: int, first: str = "e0") -> tuple[str, str]:
    """SQL replay of `rounds` alternating large-star/small-star
    contraction rounds over a canonical edge CTE named `first`
    (columns x > y) — shared by the g4 and dd17 oracles. Returns
    (chained CTE text to append after the e0 CTE, name of the final
    edge CTE). Rounds past the kernel's convergence are no-ops (the
    star forest is a fixed point), so callers pick `rounds` with
    margin over the measured convergence and pin the margin in a
    unit test."""
    steps = []
    prev = first
    for i in range(1, rounds + 1):
        steps.append(f"""
    , s{i} AS MATERIALIZED (
        SELECT x AS u, y AS v FROM {prev}
        UNION ALL SELECT y, x FROM {prev}
    ), l{i} AS MATERIALIZED (
        SELECT DISTINCT s.v AS x, m.m AS y
        FROM s{i} s JOIN (
            SELECT u, least(u, min(v)) AS m FROM s{i} GROUP BY u
        ) m ON s.u = m.u
        WHERE s.v > s.u
    ), e{i} AS MATERIALIZED (
        SELECT DISTINCT a AS x, b AS y FROM (
            SELECT l.x AS a, m.m AS b
            FROM l{i} l JOIN (
                SELECT x, min(y) AS m FROM l{i} GROUP BY x
            ) m ON l.x = m.x
            UNION ALL
            SELECT l.y, m.m
            FROM l{i} l JOIN (
                SELECT x, min(y) AS m FROM l{i} GROUP BY x
            ) m ON l.x = m.x
        ) WHERE a <> b
    )""")
        prev = f"e{i}"
    return "".join(steps), prev


def _g4_oracle() -> str:
    B = G4_CHAIN_BASE
    rounds_sql, prev = star_rounds_sql(G4_ORACLE_ROUNDS)
    return f"""
    WITH bip AS MATERIALIZED (
        SELECT DISTINCT CAST(l_partkey AS BIGINT) * 2 AS u,
               CAST(l_suppkey AS BIGINT) * 2 + 1 AS v
        FROM lineitem
        WHERE (l_partkey * 7 + l_suppkey) % 5 = 0
    ), chain AS MATERIALIZED (
        SELECT CAST(p_partkey AS BIGINT) + {B} AS u,
               CAST(p_partkey AS BIGINT) + {B + 1} AS v
        FROM part
        WHERE p_partkey % 97 <> 0
          AND p_partkey < (SELECT max(p_partkey) FROM part)
    ), e0 AS MATERIALIZED (
        SELECT DISTINCT greatest(u, v) AS x, least(u, v) AS y
        FROM (SELECT u, v FROM bip UNION ALL SELECT u, v FROM chain)
        WHERE u <> v
    ){rounds_sql}
    , labels AS MATERIALIZED (
        SELECT DISTINCT x AS node, y AS comp FROM {prev}
        UNION
        SELECT DISTINCT y, y FROM {prev}
    ), nodes0 AS MATERIALIZED (
        SELECT DISTINCT n AS node FROM (
            SELECT x AS n FROM e0 UNION ALL SELECT y FROM e0
        )
    ), final AS MATERIALIZED (
        SELECT node, comp FROM labels
        UNION ALL
        SELECT n.node, n.node
        FROM nodes0 n LEFT JOIN (SELECT DISTINCT node FROM labels) l
          ON n.node = l.node
        WHERE l.node IS NULL
    )
    SELECT comp AS component,
           CAST(count(*) AS BIGINT) AS n_nodes,
           CAST(sum(CASE WHEN node < {B} AND node % 2 = 0
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_parts,
           CAST(sum(CASE WHEN node < {B} AND node % 2 = 1
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_suppliers,
           CAST(sum(CASE WHEN node >= {B} THEN 1 ELSE 0 END) AS BIGINT)
               AS n_chain,
           CAST(max(node) AS BIGINT) AS max_node
    FROM final GROUP BY comp ORDER BY component
"""


ORACLES["g4_star_components"] = _g4_oracle()


def st11_stream_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING incremental connected components — the cross-snapshot
    dedup reality driven by the real micro-batch engine: the g4 graph
    arrives as an edge FILE STREAM in three micro-batches
    (maxFilesPerTrigger=1), and each batch is star-contracted TOGETHER
    with the star forests of ONLY the components it touches
    (operators/components.incremental_components_tick), writing just
    the changed-or-new labels as a DELTA generation — per-trigger
    write cost is O(batch-touched components), never O(all nodes)
    (round-9 VERDICT #5 fixed the previous whole-forest rewrite) —
    with periodic compaction folding deltas into a fresh base behind
    an atomic pointer flip. Soundness: a star forest is a
    connectivity-preserving O(nodes) summary of its input, the
    min-rooted star forest of a graph is UNIQUE, and untouched
    components cannot change, so folding batches in any order ends at
    exactly the batch answer. Components genuinely MERGE across ticks
    here (chain segments split by an arithmetic hash, so adjacent
    links land in different batches). Output is the g4 rollup of the
    final forest; the DuckDB oracle is the g4 batch replay — streamed
    fold == batch contraction is the whole claim. Eager-and-clean:
    the bounded rollup is collected and the run's scratch (stream
    source, forest state, checkpoint) removed."""
    import os
    import shutil
    import tempfile

    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    bip = (
        li.filter((F.col("l_partkey") * 7 + F.col("l_suppkey")) % 5 == 0)
        .select((F.col("l_partkey").cast("long") * 2).alias("u"),
                (F.col("l_suppkey").cast("long") * 2 + 1).alias("v"))
        .distinct()
    )
    mx = p.agg(F.max("p_partkey")).collect()[0][0]
    chain = (
        p.filter((F.col("p_partkey") % 97 != 0)
                 & (F.col("p_partkey") < mx))
        .select((F.col("p_partkey").cast("long") + G4_CHAIN_BASE)
                .alias("u"),
                (F.col("p_partkey").cast("long") + G4_CHAIN_BASE + 1)
                .alias("v"))
    )
    edges = bip.unionByName(chain)
    run = tempfile.mkdtemp(prefix="sg_st11_")
    try:
        src = os.path.join(run, "incoming")
        # three ingest files -> three genuine micro-batches; (u+v)%3
        # splits adjacent chain links across batches, so merges span
        # ticks
        for i in range(3):
            (edges.filter((F.col("u") + F.col("v")) % 3 == i)
             .coalesce(1).write.mode("append").parquet(src))
        state = os.path.join(run, "forest")
        schema = spark.read.parquet(src).schema
        stream = (spark.readStream.schema(schema)
                  .option("maxFilesPerTrigger", 1).parquet(src))

        from ..operators.components import (incremental_components_tick,
                                            read_star_forest)

        def batch_fn(batch_df, batch_id: int) -> None:
            # round-10 (VERDICT #5): DELTA state — each tick writes
            # only changed-or-new labels as a generation and compacts
            # every 2 generations (so this 3-batch run exercises the
            # fold + pointer flip in-path); per-trigger write cost is
            # O(batch-touched components), not O(all nodes)
            incremental_components_tick(
                batch_df, state, gen=batch_id + 1, compact_every=2)

        q = (stream.writeStream.foreachBatch(batch_fn)
             .option("checkpointLocation", os.path.join(run, "ckpt"))
             .trigger(availableNow=True).start())
        q.awaitTermination()
        labels = read_star_forest(spark, state)
        B = G4_CHAIN_BASE
        out = (
            labels.groupBy(F.col("component"))
            .agg(F.count("*").cast("long").alias("n_nodes"),
                 F.sum(((F.col("node") < B) & (F.col("node") % 2 == 0))
                       .cast("long")).alias("n_parts"),
                 F.sum(((F.col("node") < B) & (F.col("node") % 2 == 1))
                       .cast("long")).alias("n_suppliers"),
                 F.sum((F.col("node") >= B).cast("long"))
                 .alias("n_chain"),
                 F.max("node").cast("long").alias("max_node"))
            .orderBy("component")
        )
        rows = out.collect()
        schema_out = out.schema
    finally:
        shutil.rmtree(run, ignore_errors=True)
    return spark.createDataFrame(rows, schema_out).orderBy("component")


QUERIES["st11_stream_components"] = st11_stream_components

# the claim IS that the streamed fold equals the batch contraction,
# so the oracle is exactly the g4 batch replay
ORACLES["st11_stream_components"] = _g4_oracle()


G5_ROUNDS = 6


def g5_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source BFS hop distances over the g3 part-supplier supply
    graph (operators/graph.bfs_hops, 6 frontier rounds): seeds are
    the s_suppkey % 7 = 1 suppliers (scale-proportional and non-empty
    at every tier, unlike a nation filter), hops walk shared-part
    links — "how many supply links away is every part and supplier
    from the seeded supplier base", the blast-radius traversal g1-g4
    lacked. Output
    is the per-hop rollup (node counts split by part/supplier side,
    id range). Deterministic at ANY round bound — a node's emitted
    hop is its true min distance — so the DuckDB oracle replays the
    rounds as chained MATERIALIZED CTEs (the g3 recipe, no recursive
    CTE: stays hash-checked at every tier, unlike the j9/j16
    recursive walks)."""
    from ..operators.graph import bfs_hops

    li = t(spark, sf_dir, "lineitem")
    edges = (
        li.filter((F.col("l_partkey") * 7 + F.col("l_suppkey")) % 5 == 0)
        .select((F.col("l_partkey").cast("long") * 2).alias("u"),
                (F.col("l_suppkey").cast("long") * 2 + 1).alias("v"))
        .distinct()
    )
    seeds = (
        t(spark, sf_dir, "supplier")
        .filter(F.col("s_suppkey") % 7 == 1)
        .select((F.col("s_suppkey").cast("long") * 2 + 1).alias("n"))
    )
    dist = bfs_hops(edges, seeds, rounds=G5_ROUNDS)
    return (
        dist.groupBy("hops")
        .agg(F.count("*").cast("long").alias("n_nodes"),
             F.sum((F.col("n") % 2 == 0).cast("long")).alias("n_parts"),
             F.sum((F.col("n") % 2 == 1).cast("long"))
             .alias("n_suppliers"),
             F.min("n").cast("long").alias("min_node"),
             F.max("n").cast("long").alias("max_node"))
        .orderBy("hops")
    )


QUERIES["g5_bfs_hops"] = g5_bfs_hops


def _g5_oracle() -> str:
    steps = []
    prev = "d0"
    for i in range(1, G5_ROUNDS + 1):
        steps.append(f"""
    , d{i} AS MATERIALIZED (
        SELECT n, min(hops) AS hops FROM (
            SELECT n, hops FROM {prev}
            UNION ALL
            SELECT s.v AS n, r.hops + 1 AS hops
            FROM sym s JOIN {prev} r ON s.u = r.n
        ) GROUP BY n
    )""")
        prev = f"d{i}"
    return f"""
    WITH edges AS MATERIALIZED (
        SELECT DISTINCT CAST(l_partkey AS BIGINT) * 2 AS u,
               CAST(l_suppkey AS BIGINT) * 2 + 1 AS v
        FROM lineitem
        WHERE (l_partkey * 7 + l_suppkey) % 5 = 0
    ), sym AS MATERIALIZED (
        SELECT u, v FROM edges UNION SELECT v, u FROM edges
    ), d0 AS MATERIALIZED (
        SELECT DISTINCT CAST(s_suppkey AS BIGINT) * 2 + 1 AS n,
               CAST(0 AS BIGINT) AS hops
        FROM supplier WHERE s_suppkey % 7 = 1
    ){''.join(steps)}
    SELECT hops, CAST(count(*) AS BIGINT) AS n_nodes,
           CAST(sum(CASE WHEN n % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_parts,
           CAST(sum(CASE WHEN n % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_suppliers,
           CAST(min(n) AS BIGINT) AS min_node,
           CAST(max(n) AS BIGINT) AS max_node
    FROM {prev} GROUP BY hops ORDER BY hops
"""


ORACLES["g5_bfs_hops"] = _g5_oracle()


G6_K = 2
G6_ROUNDS = 3


def g6_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core peel of the g5 part-supplier supply graph
    (operators/graph.kcore, k=2, 3 bounded rounds): drop every node
    with fewer than two distinct supply links, cascade, and report
    the surviving core per node side — "which parts/suppliers keep at
    least 2 robust links once the one-off fringe is peeled away", the
    degeneracy trim a curator runs before community analysis. Fixed
    rounds keep the survivor set a deterministic pure function of the
    edge list, so the DuckDB oracle replays the peels as chained
    MATERIALIZED CTEs (the g3/g5 recipe — no recursive CTE,
    hash-checked at every tier)."""
    from ..operators.graph import kcore

    li = t(spark, sf_dir, "lineitem")
    edges = (
        li.filter((F.col("l_partkey") * 7 + F.col("l_suppkey")) % 5 == 0)
        .select((F.col("l_partkey").cast("long") * 2).alias("u"),
                (F.col("l_suppkey").cast("long") * 2 + 1).alias("v"))
        .distinct()
    )
    core = kcore(edges, k=G6_K, rounds=G6_ROUNDS)
    return (
        core.groupBy(
            F.when(F.col("n") % 2 == 0, "part").otherwise("supplier")
            .alias("side"))
        .agg(F.count("*").cast("long").alias("n_nodes"),
             F.sum("degree").cast("long").alias("degree_sum"),
             F.max("degree").cast("long").alias("max_degree"),
             F.min("n").cast("long").alias("min_node"),
             F.max("n").cast("long").alias("max_node"))
        .orderBy("side")
    )


QUERIES["g6_kcore"] = g6_kcore


def _g6_oracle() -> str:
    steps = []
    prev = "e0"
    for i in range(1, G6_ROUNDS + 1):
        steps.append(f"""
    , k{i} AS MATERIALIZED (
        SELECT u FROM {prev} GROUP BY u HAVING count(*) >= {G6_K}
    ), e{i} AS MATERIALIZED (
        SELECT s.u, s.v FROM {prev} s
        JOIN k{i} a ON s.u = a.u
        JOIN k{i} b ON s.v = b.u
    )""")
        prev = f"e{i}"
    return f"""
    WITH edges AS MATERIALIZED (
        SELECT DISTINCT CAST(l_partkey AS BIGINT) * 2 AS u,
               CAST(l_suppkey AS BIGINT) * 2 + 1 AS v
        FROM lineitem
        WHERE (l_partkey * 7 + l_suppkey) % 5 = 0
    ), e0 AS MATERIALIZED (
        SELECT u, v FROM edges UNION SELECT v, u FROM edges
    ){''.join(steps)}
    , deg AS (
        SELECT u AS n, count(*) AS degree FROM {prev} GROUP BY u
    )
    SELECT CASE WHEN n % 2 = 0 THEN 'part' ELSE 'supplier' END
               AS side,
           CAST(count(*) AS BIGINT) AS n_nodes,
           CAST(sum(degree) AS BIGINT) AS degree_sum,
           CAST(max(degree) AS BIGINT) AS max_degree,
           CAST(min(n) AS BIGINT) AS min_node,
           CAST(max(n) AS BIGINT) AS max_node
    FROM deg GROUP BY side ORDER BY side
"""


ORACLES["g6_kcore"] = _g6_oracle()
