"""Star-contraction CC ≡ hash-min CC / union-find oracle, in O(log²) rounds."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from sparkgraph.algorithms import connected_components
from sparkgraph.algorithms.components_star import connected_components_star
from sparkgraph.graph import Graph
from sparkgraph.io.edgelist import edges_from_pairs

from tests.fixtures import GRAPH_MAIN
from tests.oracles import components_oracle


def test_star_cc_matches_oracle_on_fixture(spark):
    g = Graph(edges_from_pairs(spark, GRAPH_MAIN), num_partitions=4)
    got = {r.id: r.component for r in connected_components_star(g).state.collect()}
    assert got == components_oracle(GRAPH_MAIN)
    g.unpersist()


def test_star_cc_path_graph_logarithmic_rounds(spark):
    # a 200-hop path: hash-min needs ~200 supersteps, star needs O(log²)
    pairs = [(i, i + 1) for i in range(200)]
    g = Graph(edges_from_pairs(spark, pairs), num_partitions=4)
    res = connected_components_star(g)
    got = {r.id: r.component for r in res.state.collect()}
    assert set(got.values()) == {0}
    assert res.supersteps <= 12, f"took {res.supersteps} rounds"
    g.unpersist()


def test_star_cc_equals_hashmin(spark):
    pairs = [(i, (i * 7 + 3) % 40) for i in range(60) if i != (i * 7 + 3) % 40]
    g = Graph(edges_from_pairs(spark, pairs), num_partitions=4)
    a = {r.id: r.component for r in connected_components(g).state.collect()}
    b = {r.id: r.component for r in connected_components_star(g).state.collect()}
    assert a == b
    g.unpersist()


@given(pairs=st.lists(st.tuples(st.integers(0, 12), st.integers(0, 12)), min_size=1, max_size=25))
@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture])
def test_star_cc_random_graphs(spark, pairs):
    g = Graph(edges_from_pairs(spark, pairs), num_partitions=2, persist=False)
    got = {r.id: r.component for r in connected_components_star(g).state.collect()}
    assert got == components_oracle(pairs)
