"""Salted-gather PageRank ≡ plain PageRank on a skewed graph."""

import math

from sparkgraph.algorithms import pagerank
from sparkgraph.graph import Graph
from sparkgraph.io.synth import powerlaw_edges


def test_salted_pagerank_equals_plain(spark):
    g = Graph(powerlaw_edges(spark, 30_000, 1_000), num_partitions=4)
    plain = {r.id: r.value for r in pagerank(g, iterations=8).state.collect()}
    salted = {
        r.id: r.value
        for r in pagerank(g, iterations=8, salting_threshold=100, salts=8).state.collect()
    }
    assert set(plain) == set(salted)
    assert all(math.isclose(plain[v], salted[v], rel_tol=1e-12) for v in plain)
    g.unpersist()
