"""HITS and personalized PageRank vs pure-Python oracles."""

import math
from collections import defaultdict

from sparkgraph.algorithms import pagerank
from sparkgraph.algorithms.hits import hits
from sparkgraph.graph import Graph
from sparkgraph.io.edgelist import edges_from_pairs

from tests.fixtures import GRAPH_CHAIN, GRAPH_MAIN
from tests.oracles import symmetrize


def _hits_oracle(pairs, iterations):
    nodes = sorted({v for e in pairs for v in e})
    hub = {v: 1.0 for v in nodes}
    auth = {v: 1.0 for v in nodes}
    out_ = defaultdict(list)
    in_ = defaultdict(list)
    for s, d in pairs:
        out_[s].append(d)
        in_[d].append(s)
    for _ in range(iterations):
        auth = {v: sum(hub[u] for u in in_[v]) for v in nodes}
        hub = {v: sum(auth[w] for w in out_[v]) for v in nodes}
        sh, sa = sum(hub.values()), sum(auth.values())
        hub = {v: h / sh for v, h in hub.items()}
        auth = {v: a / sa for v, a in auth.items()}
    return hub, auth


def _ppr_oracle(pairs, source, iterations, damping=0.85):
    sym = symmetrize(pairs)
    nodes = sorted({v for e in sym for v in e})
    from collections import Counter

    deg = Counter(s for s, _ in sym)
    x = {v: 0.0 for v in nodes}
    for _ in range(iterations):
        sums = defaultdict(float)
        for s, d in sym:
            sums[d] += x[s] / deg[s]
        x = {
            v: ((1 - damping) if v == source else 0.0) + damping * sums[v]
            for v in nodes
        }
    return x


def test_hits_matches_oracle(spark):
    edges = edges_from_pairs(spark, GRAPH_MAIN)
    res = hits(edges, iterations=6)
    got = {r.id: (r.hub, r.auth) for r in res.state.collect()}
    hub, auth = _hits_oracle(GRAPH_MAIN, 6)
    assert set(got) == set(hub)
    for v in hub:
        assert math.isclose(got[v][0], hub[v], abs_tol=1e-9)
        assert math.isclose(got[v][1], auth[v], abs_tol=1e-9)


def test_ppr_matches_oracle(spark):
    g = Graph(edges_from_pairs(spark, GRAPH_MAIN), num_partitions=4)
    res = pagerank(g, mode="reference", iterations=12, reset_to=1)
    got = {r.id: r.value for r in res.state.collect()}
    want = _ppr_oracle(GRAPH_MAIN, 1, 12)
    assert all(math.isclose(got[v], want[v], abs_tol=1e-9) for v in want)
    # mass stays inside vertex 1's component; unreachable vertices score 0
    assert got[9] == 0.0 and got[100] == 0.0
    # the restart vertex dominates nearby mass
    assert got[1] == max(got.values())
    g.unpersist()


def test_ppr_chain(spark):
    g = Graph(edges_from_pairs(spark, GRAPH_CHAIN), num_partitions=4)
    got = {r.id: r.value for r in pagerank(g, iterations=10, reset_to=3).state.collect()}
    want = _ppr_oracle(GRAPH_CHAIN, 3, 10)
    assert all(math.isclose(got[v], want[v], abs_tol=1e-9) for v in want)
    g.unpersist()
