"""Canonical-chain walk: the one algorithm Catalyst doesn't give us.

The reference selects forks sequentially: the canonical burnchain
snapshot chain is built by walking ``parent_burn_header_hash`` pointers
height-descending (rpc.js:152-183, SURVEY F2), and the canonical Stacks
fork by walking ``block_headers.parent_block`` from the deepest branch
tip to the genesis sentinel (rpc.js:277-309, SURVEY J9). Both are the
same problem: *the set of ancestors of one tip in a parent-pointer
forest*.

Spark-first formulation — pointer-doubling reachability:

    S_0 = {tip};  J_0 = edges (node -> parent)
    S_{k+1} = S_k  ∪  (S_k ⋈ J_k)          # add ancestors 2^k..2^{k+1}-1 away
    J_{k+1} = J_k ⋈ J_k                     # node -> its 2^{k+1}-ancestor

After k rounds S holds every ancestor within 2^k hops, so a chain of
length n needs ⌈log2 n⌉ joins — ~23 shuffles for an 8M-block chain,
versus n sequential joins for the naive loop. J stays at ≤1 row/node
(each node has one 2^k-ancestor), so the join inputs never grow beyond
the edge table itself; S grows to exactly the chain (n rows). Each
round is checkpointed via localCheckpoint to cut the exponentially
deepening lineage (the classic iterative-algorithm OOM on a real
cluster).

Genesis/no-parent is the ZERO64 sentinel (rpc.js:94, 282, 510): edges
to the sentinel are dropped, which terminates every walk.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .schemas import ZERO64


def chain_members(edges: DataFrame, tips: DataFrame,
                  id_col: str, parent_col: str,
                  max_rounds: int = 40) -> DataFrame:
    """All ancestors of `tips` (inclusive) in the parent-pointer graph.

    edges: one row per node with (id_col, parent_col).
    tips:  one column `id_col` — the walk anchors (usually one row).
    Returns a single-column DataFrame (id_col) of chain members.
    """
    jump = (
        edges.select(F.col(id_col).alias("node"), F.col(parent_col).alias("anc"))
        .filter(F.col("anc") != ZERO64)
        .filter(F.col("node") != ZERO64)
    ).localCheckpoint(eager=True)

    members = tips.select(F.col(id_col).alias("node")).distinct() \
        .localCheckpoint(eager=True)
    n = members.count()

    for _ in range(max_rounds):
        stepped = (
            members.join(jump, "node")
            .select(F.col("anc").alias("node"))
        )
        members = members.unionByName(stepped).distinct() \
            .localCheckpoint(eager=True)
        new_n = members.count()
        if new_n == n:
            # fixpoint: no member has an uncovered 2^k-ancestor, and the
            # chain is contiguous, so no farther ancestor exists either
            break
        n = new_n
        # double the jump pointers: node -> 2^(k+1)-ancestor
        jump = (
            jump.alias("a")
            .join(jump.alias("b"), F.col("a.anc") == F.col("b.node"))
            .select(F.col("a.node").alias("node"), F.col("b.anc").alias("anc"))
            .localCheckpoint(eager=True)
        )

    return members.select(F.col("node").alias(id_col))


def deepest_tip(headers: DataFrame, id_col: str = "block_hash",
                parent_col: str = "parent_block",
                height_col: str = "block_height") -> DataFrame:
    """The anchor of the canonical Stacks fork (SURVEY O3/O-R2).

    Branch tips are headers that are nobody's parent (left-anti join on
    the parent pointer); the canonical tip is the one at max height —
    identical to the reference's deepest-branch pick (rpc.js:278-280)
    because depth along a chain equals its height. Ties break on the
    hash string for determinism.
    """
    nodes = headers.select(id_col, parent_col, height_col)
    parents = nodes.select(F.col(parent_col).alias(id_col)).distinct()
    tips = nodes.join(parents, id_col, "left_anti")
    return (
        tips.orderBy(F.desc(height_col), F.col(id_col))
        .limit(1)
        .select(id_col)
    )


def canonical_snapshots(snapshots: DataFrame) -> DataFrame:
    """SURVEY F1+F2: pox-valid snapshots on the canonical burnchain
    fork, anchored at the max-height pox-valid snapshot and walked via
    (burn_header_hash <- parent_burn_header_hash).

    Matches the reference's sequential keep-if-parent-of-previous filter
    (rpc.js:156-175) including its quirks: pox-invalid rows never enter
    the chain (F1 first), duplicate heights collapse to the row the
    hash chain actually links through, and the walk stops if the chain
    breaks (missing or pox-invalid parent).
    """
    valid = snapshots.filter(F.col("pox_valid") != 0)
    tip = (
        valid.orderBy(F.desc("block_height"), F.col("burn_header_hash"))
        .limit(1)
        .select("burn_header_hash")
    )
    members = chain_members(
        valid, tip, id_col="burn_header_hash",
        parent_col="parent_burn_header_hash",
    )
    return valid.join(F.broadcast(members), "burn_header_hash")


def canonical_stacks_chain(headers: DataFrame) -> DataFrame:
    """SURVEY J9/O-R2: block_headers rows on the canonical Stacks fork
    (ancestors of the deepest tip, rpc.js:277-309)."""
    tip = deepest_tip(headers)
    members = chain_members(
        headers, tip, id_col="block_hash", parent_col="parent_block",
    )
    return headers.join(F.broadcast(members), "block_hash")
