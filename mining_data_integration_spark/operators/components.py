"""Connected components over a pair list — the cluster-collapse step a
dedup pipeline needs after candidate generation: LSH/SimHash emit
near-dup PAIRS; keeping one document per duplicate GROUP requires the
transitive closure (A~B, B~C => {A,B,C} share one cluster).

Two kernels, same contract (returns (node, component) with
component = min reachable node id):

- `connected_components` — label propagation to the minimum id
  ("hash-to-min"). Every node starts labeled with itself; each round
  every node adopts the smallest label in its closed neighborhood;
  stop when no label changes. One shuffle per round, rounds = graph
  DIAMETER — the simple round-replayable kernel (the g3 oracle
  replays its label sequence), right for the shallow clusters
  near-dup candidate graphs usually form.

- `connected_components_star` — alternating large-star/small-star
  contraction (Kiveris et al., "Connected Components in MapReduce
  and Beyond", SoCC'14): each round rewires every node's strictly
  larger neighbors to its neighborhood minimum (large-star), then
  collapses each remaining center's children onto its minimum child
  (small-star). Converges in O(log n) rounds REGARDLESS of diameter
  — a 10k-link chain needs ~14 rounds where min-label needs 10k —
  so this is the 100 TB kernel, and what `dedup_keep_min` (the
  dd-family collapse) uses: near-dup chains across crawl snapshots
  are exactly the long-diameter case.

Both kernels: each round is join + groupBy-min over a canonical
2-column edge frame, localCheckpointed per round so lineage stays
flat. Duplicate/self/reversed edges are tolerated (canonicalize +
distinct); isolated nodes can be included by passing them in
`nodes`.
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


def large_star(edges: DataFrame) -> DataFrame:
    """One large-star round: for every node u with neighborhood
    minimum m(u) = min({u} ∪ Γ(u)), rewire each strictly LARGER
    neighbor v > u to m(u). Input/output are canonical undirected
    edges (x, y) with x > y, distinct, no self loops — every emitted
    pair satisfies v > u >= m so the orientation is preserved by
    construction. Connectivity is preserved (each input edge yields
    at least one emission on its smaller endpoint's side) and the
    multiset of smaller endpoints never increases."""
    sym = edges.select(F.col("x").alias("u"), F.col("y").alias("v")) \
        .union(edges.select(F.col("y").alias("u"),
                            F.col("x").alias("v")))
    mins = (sym.groupBy("u").agg(F.min("v").alias("_mn"))
            .select("u", F.least("u", "_mn").alias("m")))
    return (sym.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("x"), F.col("m").alias("y"))
            .distinct())


def small_star(edges: DataFrame) -> DataFrame:
    """One small-star round: group the canonical edges (x, y), x > y,
    by their LARGER endpoint x; with m = min of x's smaller
    neighbors, attach x and every other smaller neighbor directly to
    m. Output stays canonical (both (x, m) and (y, m) have their
    first element > m; y = m rows are the excluded self loops)."""
    mins = edges.groupBy("x").agg(F.min("y").alias("m"))
    rewired = edges.join(mins, "x").select(
        F.explode(F.array(
            F.struct(F.col("x").alias("a"), F.col("m").alias("b")),
            F.struct(F.col("y").alias("a"), F.col("m").alias("b")),
        )).alias("p"))
    return (rewired.select(F.col("p.a").alias("x"),
                           F.col("p.b").alias("y"))
            .filter(F.col("x") != F.col("y"))
            .distinct())


def connected_components_star(pairs: DataFrame, src: str, dst: str,
                              nodes: DataFrame | None = None,
                              max_rounds: int = 64,
                              rounds_out: list | None = None
                              ) -> DataFrame:
    """O(log n)-round connected components by alternating large-star/
    small-star contraction — same contract as `connected_components`
    (returns (node, component), component = min reachable id) but
    diameter-independent: the fixed point of (large-star ∘
    small-star) is exactly the star forest in which every node hangs
    directly off its component minimum, and each round at least
    halves the height of every surviving tree, so a 10k-link chain
    converges in ~log2(10k) rounds instead of 10k.

    Convergence detection: the canonical edge set is fingerprinted
    per round (count + xor of xxhash64 + min/max endpoint); an
    unchanged fingerprint after a full round means no edge was
    rewired, which (connectivity preservation + the monotone
    smaller-endpoint potential) holds only at the star-forest fixed
    point. A fingerprint MATCH is then confirmed with a real set
    difference (equal counts + one-sided exceptAll empty <=> set
    equality) so a 2^-64 hash collision can never terminate the
    loop early — the confirm job runs once, at convergence, never
    per round. One eager localCheckpoint + one bounded fingerprint
    agg per round keeps lineage flat and every downstream read on
    checkpointed blocks.

    pairs: undirected edges, any orientation, dups/self-loops OK.
    nodes: optional one-column frame of ids to include when isolated.
    rounds_out: optional list; the number of rounds used is appended
    (tests pin the O(log n) bound through it).
    """
    all_nodes = pairs.select(F.col(src).alias("node")).union(
        pairs.select(F.col(dst).alias("node"))).distinct()
    if nodes is not None:
        all_nodes = all_nodes.unionByName(
            nodes.select(F.col(nodes.columns[0]).alias("node"))) \
            .distinct()
    # lazy: only consumed once, by the final singleton anti-join
    all_nodes = all_nodes.localCheckpoint(eager=False)

    edges = (
        pairs.select(F.greatest(src, dst).alias("x"),
                     F.least(src, dst).alias("y"))
        .filter(F.col("x") != F.col("y"))
        .distinct()
        .localCheckpoint(eager=False)
    )

    def fingerprint(e: DataFrame) -> tuple:
        row = e.agg(
            F.count("*").alias("n"),
            # bit_xor, not sum: xor of distinct 64-bit hashes cannot
            # overflow (ANSI mode aborts on long-sum overflow) and is
            # an equally strong set fingerprint over a distinct frame
            F.bit_xor(F.xxhash64("x", "y")).alias("h"),
            F.min("y").alias("lo"), F.max("x").alias("hi")).collect()[0]
        return (row["n"], row["h"], row["lo"], row["hi"])

    fp = fingerprint(edges)
    rounds = 0
    for rounds in range(1, max_rounds + 1):
        # eager vs lazy measured indistinguishable at sf0.1 (both
        # 9.6-12.4 s across runs — box noise dominates); eager is
        # kept because the round's output is read three times (the
        # fingerprint + twice by the next round's symmetrize) and
        # eager guarantees all of them hit checkpointed blocks
        prev = edges
        edges = small_star(large_star(edges)) \
            .localCheckpoint(eager=True)
        fp_new = fingerprint(edges)
        if fp_new == fp and edges.exceptAll(prev).isEmpty():
            # counts equal (fingerprint) + one-sided difference empty
            # over distinct frames => genuinely identical edge sets
            break
        fp = fp_new
    else:
        raise RuntimeError(
            f"connected_components_star did not converge in "
            f"{max_rounds} rounds")
    if rounds_out is not None:
        rounds_out.append(rounds)

    # converged star forest: every edge is (member, component-min);
    # centers label themselves; nodes absent from every surviving
    # edge (isolated or self-loop-only) are singletons
    labels = edges.select(F.col("x").alias("node"),
                          F.col("y").alias("component")) \
        .unionByName(edges.select(F.col("y").alias("node"),
                                  F.col("y").alias("component"))) \
        .distinct()
    singletons = all_nodes.join(labels.select("node"), "node",
                                "left_anti") \
        .select("node", F.col("node").alias("component"))
    return labels.unionByName(singletons)


def dedup_keep_min(docs: DataFrame, pairs: DataFrame, id_col: str,
                   pair_src: str = "id1", pair_dst: str = "id2") -> DataFrame:
    """Collapse near-dup clusters: every doc gets its cluster id (the
    min doc id of its component; singletons cluster with themselves)
    and a keep flag for the cluster representative. Uses the
    star-contraction kernel: near-dup chains across crawl snapshots
    can be arbitrarily long, and O(log n) rounds is the only round
    bound that survives them at 100 TB."""
    comp = connected_components_star(pairs, pair_src, pair_dst)
    return (
        docs.join(
            comp.withColumnRenamed("node", id_col), id_col, "left")
        .withColumn("cluster_id", F.coalesce("component", F.col(id_col)))
        .withColumn("keep", F.col("cluster_id") == F.col(id_col))
        .drop("component")
    )
