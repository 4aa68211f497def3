"""k-core, link prediction, clustering coefficient vs in-test oracles."""

import math
from collections import defaultdict

from sparkgraph.algorithms.kcore import k_core
from sparkgraph.algorithms.structure import (
    global_clustering_coefficient,
    link_prediction,
)
from sparkgraph.graph import Graph
from sparkgraph.io.edgelist import edges_from_pairs

from tests.fixtures import GRAPH_MAIN, GRAPH_MAIN_TRI
from tests.oracles import triangles_oracle


def _adj(pairs):
    adj = defaultdict(set)
    for s, d in pairs:
        if s != d:
            adj[s].add(d)
            adj[d].add(s)
    return adj


def _kcore_oracle(pairs, k):
    adj = {v: set(n) for v, n in _adj(pairs).items()}
    changed = True
    while changed:
        drop = {v for v, n in adj.items() if len(n) < k}
        changed = bool(drop)
        for v in drop:
            for w in adj[v]:
                adj[w].discard(v)
            del adj[v]
    return set(adj)


def test_kcore_matches_peeling_oracle(spark):
    # triangle fixture: the {1,3,4} triangle is the only 2-core
    g = Graph(edges_from_pairs(spark, GRAPH_MAIN_TRI), num_partitions=4)
    for k in (1, 2, 3):
        got = {r.id for r in k_core(g, k).state.collect()}
        assert got == _kcore_oracle(GRAPH_MAIN_TRI, k), f"k={k}"
    g.unpersist()


def test_kcore_empty_when_k_too_large(spark):
    g = Graph(edges_from_pairs(spark, GRAPH_MAIN), num_partitions=4)
    assert k_core(g, 5).state.count() == 0
    g.unpersist()


def test_link_prediction_matches_bruteforce(spark):
    pairs = GRAPH_MAIN_TRI
    g = Graph(edges_from_pairs(spark, pairs), num_partitions=4)
    got = {
        (r.a, r.b): (r.common, r.jaccard, r.adamic_adar)
        for r in link_prediction(g).collect()
    }
    adj = _adj(pairs)
    want = {}
    nodes = sorted(adj)
    for i, a in enumerate(nodes):
        for b in nodes[i + 1:]:
            if b in adj[a]:
                continue
            common = adj[a] & adj[b]
            if not common:
                continue
            jac = len(common) / len(adj[a] | adj[b])
            aa = sum(1.0 / math.log(len(adj[w])) for w in common)
            want[(a, b)] = (len(common), round(jac, 6), round(aa, 6))
    assert set(got) == set(want)
    for p in want:
        assert got[p][0] == want[p][0]
        assert math.isclose(got[p][1], want[p][1], abs_tol=1e-6)
        assert math.isclose(got[p][2], want[p][2], abs_tol=1e-6)
    g.unpersist()


def test_clustering_coefficient(spark):
    g = Graph(edges_from_pairs(spark, GRAPH_MAIN_TRI), num_partitions=4)
    row = global_clustering_coefficient(g).collect()[0]
    assert row.triangles == triangles_oracle(GRAPH_MAIN_TRI) == 1
    adj = _adj(GRAPH_MAIN_TRI)
    wedges = sum(len(n) * (len(n) - 1) // 2 for n in adj.values())
    assert row.wedges == wedges
    assert math.isclose(row.coefficient, 3.0 / wedges, abs_tol=1e-6)
    g.unpersist()
