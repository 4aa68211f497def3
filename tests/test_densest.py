"""Densest subgraph vs pure-Python replay of the (1+ε)-peel."""

from __future__ import annotations

import random
from collections import defaultdict

from sparkgraph.algorithms.densest import densest_subgraph
from sparkgraph.graph import Graph
from sparkgraph.io.edgelist import edges_from_pairs

from tests.fixtures import GRAPH_MAIN_TRI


def _densest_oracle(pairs, epsilon=0.1):
    edges = {(min(a, b), max(a, b)) for a, b in pairs if a != b}
    best = (-1.0, 0, set())  # (density, -round, verts) with earliest-round tie
    r = 0
    while edges:
        adj = defaultdict(set)
        for u, v in edges:
            adj[u].add(v)
            adj[v].add(u)
        n, m = len(adj), len(edges)
        density = m / n
        if density > best[0]:
            best = (density, r, set(adj))
        thr = (1.0 + epsilon) * (2.0 * m / n)
        keep = {v for v, ns in adj.items() if len(ns) > thr}
        edges = {(u, v) for u, v in edges if u in keep and v in keep}
        r += 1
    return best[2], best[0]


def test_densest_matches_replay_fixture(spark):
    g = Graph(edges_from_pairs(spark, GRAPH_MAIN_TRI), num_partitions=4)
    res = densest_subgraph(g)
    got = {r.id for r in res.state.collect()}
    want, dens = _densest_oracle(GRAPH_MAIN_TRI)
    assert res.converged and got == want
    g.unpersist()


def test_densest_matches_replay_random_with_planted_clique(spark):
    rnd = random.Random(31)
    clique = list(range(100, 108))
    pairs = [(a, b) for i, a in enumerate(clique) for b in clique[i + 1:]]
    pairs += [
        (a, b)
        for a, b in {(rnd.randrange(60), rnd.randrange(60)) for _ in range(120)}
        if a != b
    ]
    g = Graph(edges_from_pairs(spark, pairs), num_partitions=4)
    res = densest_subgraph(g)
    got = {r.id for r in res.state.collect()}
    want, dens = _densest_oracle(pairs)
    assert got == want
    # sanity: the planted 8-clique (density 3.5) is inside the winner
    assert set(clique) <= got
    g.unpersist()
