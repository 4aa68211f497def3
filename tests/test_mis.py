"""Luby MIS vs pure-Python round replay + validity invariants."""

from __future__ import annotations

import random
from collections import defaultdict

from sparkgraph.algorithms.mis import (
    MIS_AFFINE_MOD,
    MIS_AFFINE_S,
    MIS_AFFINE_V,
    maximal_independent_set,
)
from sparkgraph.graph import Graph
from sparkgraph.io.edgelist import edges_from_pairs

from tests.fixtures import GRAPH_MAIN, GRAPH_MAIN_TRI
from tests.oracles import symmetrize


def _adj(pairs):
    adj = defaultdict(set)
    for s, d in symmetrize(pairs):
        adj[s].add(d)
    return adj


def _mis_oracle_affine(pairs, max_iter=200):
    adj = {v: set(ns) for v, ns in _adj(pairs).items()}
    mis = set()
    r = 0
    while adj and r < max_iter:
        key = {
            v: ((v * MIS_AFFINE_V + r * MIS_AFFINE_S) % MIS_AFFINE_MOD) * 2**32 + v
            for v in adj
        }
        winners = {v for v in adj if all(key[v] < key[u] for u in adj[v])}
        mis |= winners
        removed = winners | {u for v in winners for u in adj[v]}
        adj = {
            v: {u for u in ns if u not in removed}
            for v, ns in adj.items()
            if v not in removed
        }
        r += 1
    return mis


def _assert_valid_mis(pairs, mis):
    adj = _adj(pairs)
    for v in mis:  # independent
        assert not (adj[v] & mis), v
    for v in adj:  # maximal: every non-member has a member neighbor
        if v not in mis:
            assert adj[v] & mis, v


def test_affine_mis_matches_replay(spark):
    for pairs in (GRAPH_MAIN, GRAPH_MAIN_TRI):
        g = Graph(edges_from_pairs(spark, pairs), num_partitions=4)
        res = maximal_independent_set(g, mixer="affine")
        got = {r.id for r in res.state.collect()}
        assert res.converged and got == _mis_oracle_affine(pairs)
        _assert_valid_mis(pairs, got)
        g.unpersist()


def test_xxhash_mis_valid_and_partitioning_independent(spark):
    rnd = random.Random(17)
    pairs = [
        (a, b)
        for a, b in {(rnd.randrange(40), rnd.randrange(40)) for _ in range(140)}
        if a != b
    ]
    outs = []
    for p in (2, 5):
        g = Graph(edges_from_pairs(spark, pairs), num_partitions=p)
        res = maximal_independent_set(g)  # xxhash default
        got = {r.id for r in res.state.collect()}
        _assert_valid_mis(pairs, got)
        outs.append(got)
        g.unpersist()
    assert outs[0] == outs[1]


def _coloring_oracle(pairs, mixer="affine"):
    """Pure-python Jones-Plassmann replay with the engine's fixed
    (mix(id), id) priority and mex color pick."""
    from sparkgraph.algorithms.mis import MIS_AFFINE_MOD, MIS_AFFINE_V

    sym = {}
    for s, d in pairs:
        if s == d:
            continue
        sym.setdefault(s, set()).add(d)
        sym.setdefault(d, set()).add(s)

    def key(v):
        return ((v * MIS_AFFINE_V) % MIS_AFFINE_MOD, v)

    color, live = {}, set(sym)
    rounds = 0
    while live:
        rounds += 1
        winners = [
            v for v in live
            if all(key(v) < key(u) for u in sym[v] if u in live)
        ]
        for v in winners:
            used = {color[u] for u in sym[v] if u in color}
            c = 0
            while c in used:
                c += 1
            color[v] = c
        live -= set(winners)
    return color, rounds


def test_coloring_matches_python_replay_and_is_proper(spark):
    from sparkgraph.algorithms.coloring import greedy_coloring
    from sparkgraph.graph import Graph
    from sparkgraph.io.edgelist import edges_from_pairs

    from tests.fixtures import GRAPH_MAIN

    want, _ = _coloring_oracle(GRAPH_MAIN)
    for parts in (2, 5):
        g = Graph(edges_from_pairs(spark, GRAPH_MAIN), num_partitions=parts)
        res = greedy_coloring(g, mixer="affine")
        assert res.converged
        got = {r.id: r.color for r in res.state.collect()}
        assert got == want, parts  # deterministic, partitioning-independent
        g.unpersist()
    # proper: no edge joins equal colors
    for s, d in GRAPH_MAIN:
        if s != d:
            assert want[s] != want[d], (s, d)


def test_coloring_xxhash_mixer_proper_on_random_graph(spark):
    import random

    from sparkgraph.algorithms.coloring import greedy_coloring
    from sparkgraph.graph import Graph
    from sparkgraph.io.edgelist import edges_from_pairs

    rng = random.Random(5)
    pairs = list({(rng.randrange(60), rng.randrange(60)) for _ in range(240)})
    pairs = [(a, b) for a, b in pairs if a != b]
    g = Graph(edges_from_pairs(spark, pairs), num_partitions=4)
    res = greedy_coloring(g)  # production xxhash mixer
    assert res.converged
    got = {r.id: r.color for r in res.state.collect()}
    nbr_max = {}
    for a, b in pairs:
        assert got[a] != got[b], (a, b)
        nbr_max[a] = max(nbr_max.get(a, 0) + 1, 1)
    # greedy bound: every color <= degree (mex over <= deg neighbors)
    deg = {}
    for a, b in pairs:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    for v, c in got.items():
        assert c <= deg[v], v
    g.unpersist()


def test_mis_and_coloring_survive_xxhash64_range_ids(spark):
    """Regression (same ANSI-overflow class as the Louvain parity guard):
    the affine priority must not overflow int64 on full-range xxhash64 ids.
    Before the pmod bound, `id * MIS_AFFINE_V` raised ARITHMETIC_OVERFLOW."""
    from sparkgraph.algorithms.coloring import greedy_coloring
    from sparkgraph.algorithms.mis import maximal_independent_set
    from sparkgraph.graph import Graph
    from sparkgraph.io.edgelist import edges_from_pairs

    from tests.fixtures import GRAPH_MAIN

    verts = sorted({v for e in GRAPH_MAIN for v in e})
    base = 7_000_000_000_000_000_000
    big = {v: base + v * 13 for v in verts}
    big[verts[0]] = -8_123_456_789_012_345_678
    big[verts[3]] = -4_611_686_018_427_387_911
    pairs = [(big[s], big[d]) for s, d in GRAPH_MAIN]
    g = Graph(edges_from_pairs(spark, pairs), num_partitions=4)

    mis = {r.id for r in maximal_independent_set(g, mixer="affine").state.collect()}
    adj = {}
    for s, d in pairs:
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    for v in mis:
        assert not (adj[v] & mis), v  # independent
    for v in adj:
        assert v in mis or (adj[v] & mis), v  # maximal

    col = {r.id: r.color for r in greedy_coloring(g, mixer="affine").state.collect()}
    for s, d in pairs:
        if s != d:
            assert col[s] != col[d], (s, d)
    g.unpersist()


def test_coloring_is_total_over_isolated_and_selfloop_vertices(spark):
    """Vertices that vanish from the simple undirected view (self-loop-only
    or appearing only in duplicate self-edges) must still get a color row
    (0 — proper for an isolated vertex): the state is total over
    graph.vertices, so downstream joins never see nulls."""
    from sparkgraph.algorithms.coloring import greedy_coloring
    from sparkgraph.graph import Graph
    from sparkgraph.io.edgelist import edges_from_pairs

    pairs = [(1, 2), (2, 3), (7, 7), (9, 9)]  # 7 and 9 are self-loop-only
    g = Graph(edges_from_pairs(spark, pairs), num_partitions=2)
    res = greedy_coloring(g, mixer="affine")
    got = {r.id: r.color for r in res.state.collect()}
    assert set(got) == {1, 2, 3, 7, 9}
    assert got[7] == 0 and got[9] == 0
    assert got[1] != got[2] and got[2] != got[3]
    g.unpersist()
