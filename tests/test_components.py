"""Connected components: transitive closure through chains, messy
edge lists, isolated nodes, and the dedup keep-min collapse."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mining_data_integration_spark.operators.components import (
    connected_components,
    dedup_keep_min,
)


def _comp(spark, edges, **kw):
    df = spark.createDataFrame(edges, "x long, y long")
    got = connected_components(df, "x", "y", **kw).collect()
    return {r.node: r.component for r in got}


def test_chain_propagates_to_far_end(spark):
    # path 1-2-3-...-20: min label must travel the full diameter
    comp = _comp(spark, [(i, i + 1) for i in range(1, 20)])
    assert set(comp.values()) == {1}
    assert len(comp) == 20


def test_two_components_and_messy_edges(spark):
    comp = _comp(spark, [
        (5, 3), (3, 5), (3, 3),        # reversed dup + self loop
        (5, 9),
        (20, 30), (30, 40),
    ])
    assert comp[3] == comp[5] == comp[9] == 3
    assert comp[20] == comp[30] == comp[40] == 20


def test_isolated_nodes_via_nodes_frame(spark):
    nodes = None

    def run(spark):
        edges = spark.createDataFrame([(1, 2)], "x long, y long")
        all_nodes = spark.createDataFrame([(1,), (2,), (7,)], "n long")
        return {
            r.node: r.component
            for r in connected_components(
                edges, "x", "y", nodes=all_nodes).collect()
        }

    comp = run(spark)
    assert comp == {1: 1, 2: 1, 7: 7}


def test_nonconvergence_raises(spark):
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 10)], "x long, y long")
    with pytest.raises(RuntimeError):
        connected_components(edges, "x", "y", max_rounds=2)


def test_dedup_keep_min_singletons_and_clusters(spark):
    docs = spark.createDataFrame([(i,) for i in range(1, 7)], "doc_id long")
    pairs = spark.createDataFrame(
        [(2, 4), (4, 6)], "id1 long, id2 long")  # cluster {2,4,6}
    out = {r.doc_id: (r.cluster_id, r.keep)
           for r in dedup_keep_min(docs, pairs, "doc_id").collect()}
    assert out[2] == (2, True)
    assert out[4] == (2, False) and out[6] == (2, False)
    for singleton in (1, 3, 5):
        assert out[singleton] == (singleton, True)
