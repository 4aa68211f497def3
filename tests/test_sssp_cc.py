"""SSSP (intended Pregel semantics) + connected components vs oracles."""

import math

from sparkgraph.algorithms import connected_components, sssp
from sparkgraph.graph import Graph
from sparkgraph.io.edgelist import edges_from_pairs

from tests.fixtures import GRAPH_CHAIN, GRAPH_MAIN
from tests.oracles import bfs_oracle, components_oracle


def test_sssp_bfs_hops_and_unreachable(spark):
    g = Graph(edges_from_pairs(spark, GRAPH_MAIN), num_partitions=4)
    res = sssp(g, source=1)
    got = {r.id: r.dist for r in res.state.collect()}
    want = bfs_oracle(GRAPH_MAIN, source=1)
    assert set(got) == set(want)
    for v in want:
        if math.isinf(want[v]):
            assert math.isinf(got[v])  # e.g. 9, 10, 100 — unreachable from 1
        else:
            assert got[v] == want[v]
    g.unpersist()


def test_sssp_chain_source_3(spark):
    g = Graph(edges_from_pairs(spark, GRAPH_CHAIN), num_partitions=4)
    got = {r.id: r.dist for r in sssp(g, source=3).state.collect()}
    assert got == bfs_oracle(GRAPH_CHAIN, source=3)
    g.unpersist()


def test_sssp_terminates_with_empty_frontier(spark):
    g = Graph(edges_from_pairs(spark, GRAPH_CHAIN), num_partitions=4)
    res = sssp(g, source=1)
    assert res.metrics[-1].changed == 0
    g.unpersist()


def test_connected_components(spark):
    g = Graph(edges_from_pairs(spark, GRAPH_MAIN), num_partitions=4)
    got = {r.id: r.component for r in connected_components(g).state.collect()}
    want = components_oracle(GRAPH_MAIN)
    assert got == want
    assert len(set(got.values())) == 5  # {1…}, {12…}, {9,10}, {100,120}, {200,210}
    g.unpersist()


def test_components_label_is_min_id(spark):
    g = Graph(edges_from_pairs(spark, GRAPH_MAIN), num_partitions=4)
    got = {r.id: r.component for r in connected_components(g).state.collect()}
    for v, c in got.items():
        assert c <= v
    assert got[25] == 1 and got[16] == 12 and got[10] == 9
    g.unpersist()
