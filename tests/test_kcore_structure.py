"""k-core, link prediction, clustering coefficient vs in-test oracles."""

import math
from collections import defaultdict

from sparkgraph.algorithms.kcore import coreness, k_core
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


def _coreness_oracle(pairs):
    """Classic min-degree peeling (Batagelj–Zaveršnik semantics)."""
    adj = {v: set(n) for v, n in _adj(pairs).items()}
    core = {}
    k = 0
    while adj:
        k = max(k, min(len(n) for n in adj.values()))
        drop = [v for v, n in adj.items() if len(n) <= k]
        for v in drop:
            core[v] = k
            for w in adj[v]:
                adj[w].discard(v)
            del adj[v]
    return core


def test_coreness_matches_peeling_oracle(spark):
    for pairs in (GRAPH_MAIN, GRAPH_MAIN_TRI):
        g = Graph(edges_from_pairs(spark, pairs), num_partitions=4)
        res = coreness(g)
        assert res.converged
        got = {r.id: r.coreness for r in res.state.collect()}
        assert got == _coreness_oracle(pairs)
        g.unpersist()


def test_coreness_consistent_with_kcore(spark):
    # {v : coreness(v) >= k} IS the k-core, for every k
    g = Graph(edges_from_pairs(spark, GRAPH_MAIN_TRI), num_partitions=4)
    core = {r.id: r.coreness for r in coreness(g).state.collect()}
    for k in (1, 2, 3):
        got = {r.id for r in k_core(g, k).state.collect()}
        assert got == {v for v, c in core.items() if c >= k}, f"k={k}"
    g.unpersist()


def test_coreness_random_graph(spark):
    import random

    rnd = random.Random(7)
    pairs = list({(rnd.randrange(40), rnd.randrange(40)) for _ in range(160)})
    pairs = [(a, b) for a, b in pairs if a != b]
    g = Graph(edges_from_pairs(spark, pairs), num_partitions=4)
    res = coreness(g)
    assert res.converged
    got = {r.id: r.coreness for r in res.state.collect()}
    assert got == _coreness_oracle(pairs)
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


def test_linkpred_wedge_cap_bounds_hubs(spark):
    """A star hub above the cap contributes no wedges; spokes stay scored
    through their other (low-degree) common neighbors."""
    from sparkgraph.graph import Graph
    from sparkgraph.algorithms.structure import link_prediction

    # hub 0 connects to 1..30; besides that, a triangle-ish tail 1-2, 2-3
    edges = [(0, i) for i in range(1, 31)] + [(1, 2), (2, 3)]
    g = Graph(spark.createDataFrame(edges, "src long, dst long"))
    capped = link_prediction(g, min_common=1, max_wedge_degree=10)
    # every wedge through the deg-30 hub is suppressed: only wedges through
    # deg<=10 vertices remain (e.g. 1-3 through 2)
    rows = {(r.a, r.b): r.common for r in capped.collect()}
    assert (1, 3) in rows
    assert all(not (a != 0 and b != 0 and (a, b) not in {(1, 3)}) or c >= 1
               for (a, b), c in rows.items())
    # no pair owes its commonality to the hub: pair (i,j) of spokes with no
    # other link must be absent
    assert (4, 5) not in rows
    uncapped = link_prediction(g, min_common=1, max_wedge_degree=None)
    assert (4, 5) in {(r.a, r.b) for r in uncapped.collect()}
