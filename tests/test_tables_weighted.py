"""Versioned table IO (SDFS op parity) + weighted-edge SSSP semantics."""

import pytest

from sparkgraph.algorithms import sssp
from sparkgraph.graph import Graph
from sparkgraph.io.tables import TableIO

from tests.fixtures import GRAPH_CHAIN
from tests.oracles import bfs_oracle


def test_save_load_versioned(spark, tmp_path):
    io = TableIO(spark, str(tmp_path))
    df1 = spark.range(5).selectExpr("id", "id * 2 AS v")
    df2 = spark.range(3).selectExpr("id", "id * 3 AS v")
    assert io.save(df1, "t") == 1
    assert io.save(df2, "t") == 2
    assert io.load("t").count() == 3  # newest wins (last-write-wins pointer)
    assert io.load("t", version=1).count() == 5  # time travel
    assert io.versions("t") == [1, 2]
    assert io.list_tables() == ["t"]
    io.drop("t")
    assert io.list_tables() == []
    with pytest.raises(FileNotFoundError):
        io.load("t")


def test_weighted_sssp_scales_distances(spark):
    edges = spark.createDataFrame(
        [(s, d, 2.5) for s, d in GRAPH_CHAIN], "src long, dst long, weight double"
    )
    g = Graph(edges, num_partitions=4)
    got = {r.id: r.dist for r in sssp(g, source=1).state.collect()}
    want = {v: d * 2.5 for v, d in bfs_oracle(GRAPH_CHAIN, source=1).items()}
    assert got == want
    g.unpersist()


def test_mixed_weight_sssp_prefers_cheaper_path(spark):
    # 1 →(5.0) 3 and 1 →(1.0) 2 →(1.0) 3 : the 2-hop path wins
    edges = spark.createDataFrame(
        [(1, 3, 5.0), (1, 2, 1.0), (2, 3, 1.0)], "src long, dst long, weight double"
    )
    g = Graph(edges, num_partitions=2)
    got = {r.id: r.dist for r in sssp(g, source=1).state.collect()}
    assert got == {1: 0.0, 2: 1.0, 3: 2.0}
    g.unpersist()
