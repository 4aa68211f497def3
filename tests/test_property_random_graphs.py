"""Property-based differential tests: random small graphs vs pure-Python
oracles (hypothesis drives the graph shapes; each algorithm must agree with
its oracle on EVERY generated graph, including self-loops, parallel edges,
isolated pairs, and stars)."""

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from sparkgraph.algorithms import connected_components, pagerank, sssp
from sparkgraph.graph import Graph
from sparkgraph.io.edgelist import edges_from_pairs

from tests.oracles import bfs_oracle, components_oracle, pagerank_oracle

edge = st.tuples(st.integers(0, 15), st.integers(0, 15))
graphs = st.lists(edge, min_size=1, max_size=30)

SET = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


@given(pairs=graphs)
@SET
def test_pagerank_matches_oracle_on_random_graphs(spark, pairs):
    g = Graph(edges_from_pairs(spark, pairs), num_partitions=2, persist=False)
    got = {r.id: r.value for r in pagerank(g, iterations=8).state.collect()}
    want = pagerank_oracle(pairs, iterations=8)
    assert set(got) == set(want)
    assert all(math.isclose(got[v], want[v], abs_tol=1e-9) for v in want)


@given(pairs=graphs)
@SET
def test_components_match_oracle_on_random_graphs(spark, pairs):
    g = Graph(edges_from_pairs(spark, pairs), num_partitions=2, persist=False)
    got = {r.id: r.component for r in connected_components(g).state.collect()}
    assert got == components_oracle(pairs)


@given(pairs=graphs, source=st.integers(0, 15))
@SET
def test_sssp_matches_bfs_on_random_graphs(spark, pairs, source):
    g = Graph(edges_from_pairs(spark, pairs), num_partitions=2, persist=False)
    got = {r.id: r.dist for r in sssp(g, source=source).state.collect()}
    want = bfs_oracle(pairs, source)
    for v in want:
        if math.isinf(want[v]):
            assert math.isinf(got[v])
        else:
            assert got[v] == want[v]
