"""Connected components over a pair list — the cluster-collapse step a
dedup pipeline needs after candidate generation: LSH/SimHash emit
near-dup PAIRS; keeping one document per duplicate GROUP requires the
transitive closure (A~B, B~C => {A,B,C} share one cluster).

Algorithm: label propagation to the minimum id ("hash-to-min").
Every node starts labeled with itself; each round every node adopts
the smallest label in its closed neighborhood; stop when no label
changes. Each round is one shuffle (groupBy node over the symmetrized
edge list) and the iterate is a 2-column (node, label) frame that is
localCheckpointed per round, so lineage stays flat. Rounds needed =
graph diameter — near-dup clusters are shallow (a handful of hops),
so 2-4 rounds in practice; for adversarially long chain graphs the
large-star/small-star contraction (O(log n) rounds) is the upgrade
path, same interface.

Duplicate/self/reversed edges are tolerated (symmetrize + distinct);
isolated nodes can be included by passing them in `nodes`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(pairs: DataFrame, src: str, dst: str,
                         nodes: DataFrame | None = None,
                         max_rounds: int = 50) -> DataFrame:
    """Returns (node, component) with component = min node id reachable.

    pairs: undirected edges, one per row (any orientation, dups OK).
    nodes: optional one-column frame of node ids to include even when
           isolated (no incident pair).
    """
    edges = (
        pairs.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(
            pairs.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = edges.select(F.col("a").alias("node")).distinct()
    if nodes is not None:
        labels = labels.unionByName(
            nodes.select(F.col(nodes.columns[0]).alias("node"))).distinct()
    labels = labels.withColumn("component", F.col("node")) \
        .localCheckpoint(eager=True)

    for _ in range(max_rounds):
        # smallest label among each node's neighbors
        nbr_min = (
            edges.join(labels.withColumnRenamed("node", "b"), "b")
            .groupBy(F.col("a").alias("node"))
            .agg(F.min("component").alias("nbr_component"))
        )
        updated = (
            labels.join(nbr_min, "node", "left")
            .select(
                "node",
                F.least(
                    "component",
                    F.coalesce("nbr_component", "component"),
                ).alias("component"),
                (F.col("nbr_component") < F.col("component"))
                .alias("_changed"),
            )
            .localCheckpoint(eager=True)
        )
        changed = updated.filter(F.col("_changed")).limit(1).count()
        labels = updated.drop("_changed")
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} rounds")
    return labels


def dedup_keep_min(docs: DataFrame, pairs: DataFrame, id_col: str,
                   pair_src: str = "id1", pair_dst: str = "id2") -> DataFrame:
    """Collapse near-dup clusters: every doc gets its cluster id (the
    min doc id of its component; singletons cluster with themselves)
    and a keep flag for the cluster representative."""
    comp = connected_components(pairs, pair_src, pair_dst)
    return (
        docs.join(
            comp.withColumnRenamed("node", id_col), id_col, "left")
        .withColumn("cluster_id", F.coalesce("component", F.col(id_col)))
        .withColumn("keep", F.col("cluster_id") == F.col(id_col))
        .drop("component")
    )
