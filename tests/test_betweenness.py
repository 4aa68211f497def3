"""Sampled Brandes betweenness vs the pure-Python oracle."""

import math
import random

import pytest

from sparkgraph.algorithms.betweenness import betweenness_sampled
from sparkgraph.graph import Graph
from tests.oracles import betweenness_oracle


def _close(got: dict, want: dict, tol: float = 1e-9) -> bool:
    return set(got) == set(want) and all(
        math.isclose(got[k], want[k], rel_tol=0, abs_tol=tol) for k in want
    )


def _run(spark, pairs, **kw):
    g = Graph(spark.createDataFrame(pairs, "src long, dst long"))
    res = betweenness_sampled(g, **kw)
    return {r.id: r.betweenness for r in res.state.collect()}


def test_star_center_dominates(spark):
    pairs = [(0, i) for i in range(1, 8)]
    got = _run(spark, pairs, pivots=list(range(8)))  # all sources = exact
    want = betweenness_oracle(pairs)
    assert _close(got, want)
    assert got[0] == 1.0  # the center lies on every pair's only path
    assert all(got[i] == 0.0 for i in range(1, 8))


def test_path_graph_exact(spark):
    pairs = [(i, i + 1) for i in range(5)]
    got = _run(spark, pairs, pivots=list(range(6)))
    assert _close(got, betweenness_oracle(pairs))


def test_sampled_matches_oracle_with_same_pivots(spark):
    rng = random.Random(5)
    n = 30
    pairs = list({(rng.randrange(n), rng.randrange(n)) for _ in range(70)})
    pairs = [(a, b) for a, b in pairs if a != b]
    pivots = [0, 1, 2, 3]
    got = _run(spark, pairs, pivots=pivots)
    want = betweenness_oracle(pairs, pivots=pivots)
    assert _close(got, want, tol=1e-7)


def test_multiplicity_of_shortest_paths(spark):
    # 0-1-3, 0-2-3: two shortest paths 0→3; each middle carries sigma 1/2
    pairs = [(0, 1), (0, 2), (1, 3), (2, 3)]
    got = _run(spark, pairs, pivots=[0, 1, 2, 3], normalize=False)
    want = betweenness_oracle(pairs, normalize=False)
    assert _close(got, want)
    assert math.isclose(got[1], 0.5) and math.isclose(got[2], 0.5)
