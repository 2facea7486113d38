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
