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
