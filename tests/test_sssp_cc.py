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


def test_sssp_parent_tree(spark):
    from collections import defaultdict

    from tests.fixtures import GRAPH_MAIN
    from tests.oracles import bfs_oracle, symmetrize

    g = Graph(edges_from_pairs(spark, GRAPH_MAIN), num_partitions=4)
    res = sssp(g, source=1, track_parents=True)
    rows = {r.id: (r.dist, r.parent) for r in res.state.collect()}
    dist = bfs_oracle(GRAPH_MAIN, 1)
    adj = defaultdict(set)
    for s, d in symmetrize(GRAPH_MAIN):
        adj[s].add(d)
    inf = float("inf")
    for v, (dv, pv) in rows.items():
        assert dv == dist[v]
        if v == 1 or dv == inf:
            assert pv is None  # source and unreachable carry NULL
        else:
            # BFS parent = smallest-id neighbor one layer closer
            want = min(u for u in adj[v] if dist[u] == dv - 1)
            assert pv == want, v
    g.unpersist()


def test_sssp_weighted_parents_follow_simulation(spark):
    # superstep-exact simulation: parent set on strict improvement only,
    # min (dist, src) within the improving step
    wpairs = [(s, d, float(1 + (s + d) % 3)) for s, d in GRAPH_CHAIN]
    g = Graph(spark.createDataFrame(wpairs, "src long, dst long, weight double"))
    res = sssp(g, source=1, track_parents=True)
    got = {r.id: (r.dist, r.parent) for r in res.state.collect()}

    from collections import defaultdict

    adj = defaultdict(list)
    for s, d, w in wpairs:
        adj[s].append((d, w))
        adj[d].append((s, w))
    inf = float("inf")
    dist = {v: inf for v in adj}
    parent = {v: None for v in adj}
    dist[1] = 0.0
    frontier = {1}
    while frontier:
        best: dict[int, tuple[float, int]] = {}
        for u in frontier:
            for v, w in adj[u]:
                cand = (dist[u] + w, u)
                if v not in best or cand < best[v]:
                    best[v] = cand
        frontier = set()
        for v, (nd, via) in best.items():
            if nd < dist[v]:
                dist[v], parent[v] = nd, via
                frontier.add(v)
    assert got == {v: (dist[v], parent[v]) for v in adj}
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


def test_unconverged_ceiling_warns_and_flags(spark, caplog):
    """A fixpoint loop cut off by max_iter must report converged=False and
    emit the convergence-guard warning (VERDICT r3 #10); partial distances
    must still be BFS-prefix-correct."""
    import logging

    with caplog.at_level(logging.WARNING, logger="sparkgraph"):
        res = sssp(Graph(edges_from_pairs(spark, GRAPH_CHAIN)), source=min(
            v for e in GRAPH_CHAIN for v in e
        ), max_iter=1)
    assert not res.converged
    assert res.supersteps == 1
    assert any("max_iter ceiling" in r.message for r in caplog.records)
    # depth-1 prefix is exact; deeper vertices still at +inf
    d = {r.id: r.dist for r in res.state.collect()}
    src = min(v for e in GRAPH_CHAIN for v in e)
    want = bfs_oracle(GRAPH_CHAIN, src)
    for v, dist in d.items():
        if want.get(v, math.inf) <= 1:
            assert dist == want[v], v
        else:
            assert math.isinf(dist), v

    # the same ceiling on CC: converged False + warning
    caplog.clear()
    with caplog.at_level(logging.WARNING, logger="sparkgraph"):
        res2 = connected_components(
            Graph(edges_from_pairs(spark, GRAPH_CHAIN)), max_iter=1
        )
    assert not res2.converged
    assert any("max_iter ceiling" in r.message for r in caplog.records)
