"""Synchronous modularity-gain moving vs a pure-Python integer replay."""

from __future__ import annotations

from collections import defaultdict

from sparkgraph.algorithms.louvain import louvain_move
from sparkgraph.graph import Graph
from sparkgraph.io.edgelist import edges_from_pairs

from tests.fixtures import GRAPH_MAIN
from tests.oracles import symmetrize


def _louvain_oracle(pairs, rounds):
    sym = symmetrize(pairs)
    deg = defaultdict(int)
    nbrs = defaultdict(list)
    for s, d in sym:
        deg[s] += 1
        nbrs[s].append(d)
    two_m = len(sym)
    label = {v: v for v in deg}
    for _ in range(rounds):
        ctot = defaultdict(int)
        for v in deg:
            ctot[label[v]] += deg[v]
        new = {}
        moved = False
        for v in deg:
            kvc = defaultdict(int)
            for u in nbrs[v]:
                kvc[label[u]] += 1
            cands = set(kvc) | {label[v]}
            best = None
            for c in sorted(cands):
                gain = two_m * kvc.get(c, 0) - deg[v] * (
                    ctot[c] - (deg[v] if c == label[v] else 0)
                )
                if best is None or gain > best[0]:
                    best = (gain, c)
            new[v] = best[1]
            moved |= new[v] != label[v]
        label = new
        if not moved:
            break
    return label


def test_louvain_matches_python_replay(spark):
    for rounds in (1, 3, 6):
        g = Graph(edges_from_pairs(spark, GRAPH_MAIN), num_partitions=4)
        got = {r.id: r.label for r in louvain_move(g, rounds=rounds).state.collect()}
        assert got == _louvain_oracle(GRAPH_MAIN, rounds), rounds
        g.unpersist()


def test_louvain_finds_planted_communities(spark):
    # two 5-cliques joined by one bridge edge: moving phase should put each
    # clique in one community and modularity should beat the singleton init
    pairs = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    pairs += [(a, b) for a in range(10, 15) for b in range(a + 1, 15)]
    pairs.append((0, 10))
    g = Graph(edges_from_pairs(spark, pairs), num_partitions=4)
    res = louvain_move(g, rounds=8)
    got = {r.id: r.label for r in res.state.collect()}
    left = {got[v] for v in range(5)}
    right = {got[v] for v in range(10, 15)}
    assert len(left) == 1 and len(right) == 1 and left != right
    from sparkgraph.algorithms.structure import modularity

    q = modularity(g, res.state).collect()[0][0]
    assert q > 0.3  # two dense blocks + one bridge: strong community structure
    g.unpersist()
