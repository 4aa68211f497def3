"""Distributed Borůvka minimum spanning forest vs a pure-Python Kruskal
oracle (both under the same strict (weight, u, v) total order, so the forest
is unique and the comparison is edge-exact)."""

from __future__ import annotations

import random

from sparkgraph.algorithms.mst import minimum_spanning_forest


def _kruskal(edges):
    """edges: (u, v, w) canonical u<v, min-weight per pair. Returns the
    unique MSF under the (w, u, v) strict total order."""
    parent: dict[int, int] = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    out = []
    for u, v, w in sorted(edges, key=lambda e: (e[2], e[0], e[1])):
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[ru] = rv
            out.append((u, v, w))
    return sorted(out)


def _canon(pairs):
    best: dict[tuple[int, int], float] = {}
    for s, d, w in pairs:
        if s == d:
            continue
        k = (min(s, d), max(s, d))
        best[k] = min(best.get(k, float("inf")), float(w))
    return [(u, v, w) for (u, v), w in best.items()]


def _run(spark, pairs):
    df = spark.createDataFrame(pairs, "src long, dst long, weight double")
    res = minimum_spanning_forest(df)
    assert res.converged
    return sorted((r.u, r.v, r.weight) for r in res.state.collect())


def test_path_and_cycle(spark):
    # cycle 0-1-2-3-0 with one heavy edge: MST drops exactly the heavy edge
    pairs = [(0, 1, 1.0), (1, 2, 2.0), (2, 3, 3.0), (3, 0, 9.0)]
    assert _run(spark, pairs) == [(0, 1, 1.0), (1, 2, 2.0), (2, 3, 3.0)]


def test_tied_weights_are_deterministic(spark):
    # all weights equal: the (w, u, v) order must pick the lexicographically
    # smallest spanning edges — K4 keeps (0,1), (0,2), (0,3)
    pairs = [
        (a, b, 5.0) for a in range(4) for b in range(a + 1, 4)
    ]
    assert _run(spark, pairs) == [(0, 1, 5.0), (0, 2, 5.0), (0, 3, 5.0)]


def test_forest_on_disconnected_graph(spark):
    pairs = [(0, 1, 2.0), (1, 2, 1.0), (10, 11, 4.0), (20, 21, 1.0), (21, 22, 8.0), (20, 22, 3.0)]
    got = _run(spark, pairs)
    want = _kruskal(_canon(pairs))
    assert got == want
    # |MSF| = V - #components = 7 - 3... vertices {0,1,2},{10,11},{20,21,22}
    assert len(got) == 8 - 3


def test_parallel_edges_and_self_loops_collapse(spark):
    pairs = [(0, 1, 7.0), (1, 0, 2.0), (0, 1, 5.0), (1, 1, 0.5), (1, 2, 3.0)]
    got = _run(spark, pairs)
    assert got == [(0, 1, 2.0), (1, 2, 3.0)]


def test_random_graphs_match_kruskal(spark):
    rng = random.Random(13)
    for trial in range(3):
        n = 40
        raw = list({(rng.randrange(n), rng.randrange(n)) for _ in range(140)})
        # integer weights from a SMALL range => many ties exercise the
        # total-order determinism
        pairs = [
            (a, b, float(rng.randrange(1, 6))) for a, b in raw if a != b
        ]
        got = _run(spark, pairs)
        want = _kruskal(_canon(pairs))
        assert got == want, trial
