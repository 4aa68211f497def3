"""Harmonic closeness vs pure-Python BFS oracles."""

from __future__ import annotations

import math

from sparkgraph.algorithms.closeness import harmonic_closeness_sampled
from sparkgraph.graph import Graph

from tests.fixtures import GRAPH_MAIN
from tests.oracles import bfs_oracle

INF = float("inf")


def _harmonic_oracle(pairs, pivots, normalize=True):
    nodes = sorted({v for e in pairs for v in e})
    n = len(nodes)
    acc = {v: 0.0 for v in nodes}
    for p in pivots:
        dist = bfs_oracle(pairs, p)
        for v, d in dist.items():
            if 0 < d < INF:
                acc[v] += 1.0 / d
    scale = n / len(pivots)
    denom = max(n - 1, 1) if normalize else 1
    return {v: acc[v] * scale / denom for v in nodes}


def _got(spark, pairs, **kw):
    g = Graph(spark.createDataFrame(pairs, "src long, dst long"))
    res = harmonic_closeness_sampled(g, **kw)
    assert res.converged
    return {r.id: r.closeness for r in res.state.collect()}


def test_exact_when_pivots_cover_all_vertices(spark):
    nodes = sorted({v for e in GRAPH_MAIN for v in e})
    got = _got(spark, GRAPH_MAIN, pivots=nodes)
    want = _harmonic_oracle(GRAPH_MAIN, nodes)
    assert set(got) == set(want)
    for v in want:
        assert math.isclose(got[v], want[v], rel_tol=1e-9), v
    # isolated-in-sample sanity: pair components score tiny but nonzero
    assert got[100] > 0 and got[max(got, key=got.get)] == max(got.values())


def test_sampled_pivots_match_python_replay(spark):
    k = 4
    nodes = sorted({v for e in GRAPH_MAIN for v in e})
    got = _got(spark, GRAPH_MAIN, k=k)
    want = _harmonic_oracle(GRAPH_MAIN, nodes[:k])  # default = k smallest ids
    for v in want:
        assert math.isclose(got[v], want[v], rel_tol=1e-9), v


def test_eccentricity_matches_bfs(spark):
    from sparkgraph.algorithms.closeness import eccentricity_sampled

    nodes = sorted({v for e in GRAPH_MAIN for v in e})
    g = Graph(spark.createDataFrame(GRAPH_MAIN, "src long, dst long"))
    got = {
        r.pivot: r.eccentricity
        for r in eccentricity_sampled(g, pivots=nodes).state.collect()
    }
    for p in nodes:
        dist = bfs_oracle(GRAPH_MAIN, p)
        assert got[p] == max(int(d) for d in dist.values() if d < INF), p
    # diameter lower bound from the full sample IS the diameter
    want_diam = max(
        max(int(d) for d in bfs_oracle(GRAPH_MAIN, p).values() if d < INF)
        for p in nodes
    )
    assert max(got.values()) == want_diam == 7
    g.unpersist()


def test_unnormalized_scale(spark):
    nodes = sorted({v for e in GRAPH_MAIN for v in e})
    got = _got(spark, GRAPH_MAIN, pivots=nodes, normalize=False)
    want = _harmonic_oracle(GRAPH_MAIN, nodes, normalize=False)
    for v in want:
        assert math.isclose(got[v], want[v], rel_tol=1e-9), v
