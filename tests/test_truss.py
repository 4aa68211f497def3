"""k-truss vs pure-Python support-peeling oracle."""

from __future__ import annotations

import random
from collections import defaultdict

from sparkgraph.algorithms.truss import k_truss
from sparkgraph.graph import Graph
from sparkgraph.io.edgelist import edges_from_pairs

from tests.fixtures import GRAPH_MAIN_TRI


def _truss_oracle(pairs, k):
    edges = {(min(a, b), max(a, b)) for a, b in pairs if a != b}
    while True:
        adj = defaultdict(set)
        for u, v in edges:
            adj[u].add(v)
            adj[v].add(u)
        weak = {
            (u, v) for u, v in edges if len(adj[u] & adj[v]) < k - 2
        }
        if not weak:
            return edges
        edges -= weak


def test_truss_on_triangle_fixture(spark):
    # GRAPH_MAIN_TRI's only triangle is {1,3,4}: its 3 edges are the 3-truss
    g = Graph(edges_from_pairs(spark, GRAPH_MAIN_TRI), num_partitions=4)
    got3 = {(r.u, r.v) for r in k_truss(g, 3).state.collect()}
    assert got3 == {(1, 3), (1, 4), (3, 4)}
    # k=2 keeps every edge; k=4 needs every edge in 2 triangles -> empty
    n_edges = g.simple_undirected().count()
    assert k_truss(g, 2).state.count() == n_edges
    assert k_truss(g, 4).state.count() == 0
    g.unpersist()


def test_truss_random_graphs_match_oracle(spark):
    rnd = random.Random(23)
    for trial in range(2):
        pairs = [
            (a, b)
            for a, b in {(rnd.randrange(20), rnd.randrange(20)) for _ in range(90)}
            if a != b
        ]
        g = Graph(edges_from_pairs(spark, pairs), num_partitions=4)
        for k in (3, 4):
            res = k_truss(g, k)
            assert res.converged
            got = {(r.u, r.v) for r in res.state.collect()}
            assert got == _truss_oracle(pairs, k), (trial, k)
        g.unpersist()


def _truss_rounds_oracle(pairs, k):
    """Bulk-peel rounds (edge-sets after each drop round) — the round-by-round
    trajectory a full support recount would produce."""
    edges = {(min(a, b), max(a, b)) for a, b in pairs if a != b}
    rounds = []
    while True:
        adj = defaultdict(set)
        for u, v in edges:
            adj[u].add(v)
            adj[v].add(u)
        weak = {(u, v) for u, v in edges if len(adj[u] & adj[v]) < k - 2}
        if not weak:
            return edges, rounds
        edges -= weak
        rounds.append(set(edges))


def test_truss_deep_peel_matches_full_recount_trajectory(spark):
    """Peel-heavy fixture (random graph chosen for a 13-round cascade): the
    incremental support maintenance must reproduce the exact bulk-peel drop
    sequence of a full per-round recount — same final truss, same number of
    drop rounds — while each round only enumerates triangles incident to
    that round's dropped edges."""
    rnd = random.Random(214)
    pairs = sorted(
        {(a, b) for a, b in ((rnd.randrange(24), rnd.randrange(24)) for _ in range(110)) if a != b}
    )
    g = Graph(edges_from_pairs(spark, pairs), num_partitions=4)
    want_final, want_rounds = _truss_rounds_oracle(pairs, 4)
    # core_prune off: this test pins the UNPRUNED bulk-peel trajectory (the
    # (k−1)-core prune legitimately removes some rounds' edges upfront)
    res = k_truss(g, 4, core_prune=False)
    assert res.converged
    got = {(r.u, r.v) for r in res.state.collect()}
    assert got == want_final and len(want_final) > 0
    # incremental peel takes the same number of drop rounds (+1 fixpoint check)
    assert res.supersteps == len(want_rounds) + 1
    assert len(want_rounds) >= 10  # the fixture actually peels deep
    g.unpersist()


def test_truss_core_prune_equivalence(spark):
    """(k−1)-core pre-pruning must not change the fixpoint: the k-truss is a
    subgraph of the (k−1)-core and peeling is confluent, so pruned and
    unpruned peels land on the identical edge set."""
    rnd = random.Random(77)
    pairs = sorted(
        {(a, b) for a, b in ((rnd.randrange(30), rnd.randrange(30)) for _ in range(160)) if a != b}
    )
    g = Graph(edges_from_pairs(spark, pairs), num_partitions=4)
    for k in (3, 4, 5):
        pruned = {(r.u, r.v) for r in k_truss(g, k, core_prune=True).state.collect()}
        plain = {(r.u, r.v) for r in k_truss(g, k, core_prune=False).state.collect()}
        assert pruned == plain == _truss_oracle(pairs, k), k
    g.unpersist()
