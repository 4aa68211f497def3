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


@given(pairs=graphs)
@SET
def test_katz_matches_oracle_on_random_graphs(spark, pairs):
    from collections import defaultdict

    from sparkgraph.algorithms import katz_centrality

    from tests.oracles import symmetrize

    alpha, iters = 0.01, 5
    g = Graph(edges_from_pairs(spark, pairs), num_partitions=2, persist=False)
    got = {r.id: r.value for r in katz_centrality(g, alpha, 1.0, iters).state.collect()}
    out = defaultdict(list)
    for s, d in symmetrize(pairs):
        out[s].append(d)
    x = {v: 0.0 for v in out}
    for _ in range(iters):
        sums = defaultdict(float)
        for s, ds in out.items():
            for d in ds:
                sums[d] += x[s]
        x = {v: 1.0 + alpha * sums[v] for v in out}
    assert set(got) == set(x)
    assert all(math.isclose(got[v], x[v], abs_tol=1e-9) for v in x)


@given(pairs=graphs)
@SET
def test_node2vec_valid_walks_on_random_graphs(spark, pairs):
    """Every hop lands on a real simple-graph edge, every walk has full
    length, and the trace is a pure function of the graph (partitioning
    independent) — on arbitrary shapes incl. self-loops and parallel edges."""
    from sparkgraph.algorithms.walks import node2vec_walks

    simple = {(a, b) for a, b in pairs if a != b}
    if not simple:
        return  # walks are defined on the loop-free view
    adj = {}
    for a, b in simple:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    g = Graph(edges_from_pairs(spark, pairs), num_partitions=2, persist=False)
    walk_len = 4
    trace = sorted(
        (r.walk_id, r.step, r.vertex)
        for r in node2vec_walks(g, walk_len, p=2, q=3, mixer="affine").collect()
    )
    by_walk: dict[int, dict[int, int]] = {}
    for w, s, v in trace:
        by_walk.setdefault(w, {})[s] = v
    assert set(by_walk) == set(adj)
    for w, steps in by_walk.items():
        assert steps[0] == w and len(steps) == walk_len + 1
        for s in range(1, walk_len + 1):
            assert steps[s] in adj[steps[s - 1]], (w, s)
