"""Weighted PageRank vs oracle; unit weights reduce to the reference mode."""

import math
from collections import defaultdict

from sparkgraph.algorithms import pagerank
from sparkgraph.graph import Graph

from tests.fixtures import GRAPH_MAIN
from tests.oracles import pagerank_oracle


def _wpr_oracle(wedges, iterations, damping=0.85):
    sym = wedges + [(d, s, w) for s, d, w in wedges]
    nodes = sorted({v for s, d, _ in sym for v in (s, d)})
    n = len(nodes)
    wdeg = defaultdict(float)
    for s, _, w in sym:
        wdeg[s] += w
    x = {v: 0.0 for v in nodes}
    for _ in range(iterations):
        sums = defaultdict(float)
        for s, d, w in sym:
            sums[d] += x[s] * w / wdeg[s]
        x = {v: (1 - damping) / n + damping * sums[v] for v in nodes}
    return x


def test_weighted_pagerank_matches_oracle(spark):
    wedges = [(1, 2, 3.0), (1, 3, 1.0), (2, 3, 0.5), (3, 4, 2.0)]
    df = spark.createDataFrame(wedges, "src long, dst long, weight double")
    g = Graph(df, num_partitions=2)
    got = {r.id: r.value for r in pagerank(g, iterations=10, weighted=True).state.collect()}
    want = _wpr_oracle(wedges, 10)
    assert all(math.isclose(got[v], want[v], abs_tol=1e-9) for v in want)
    g.unpersist()


def test_unit_weights_reduce_to_reference_mode(spark):
    from sparkgraph.io.edgelist import edges_from_pairs

    g = Graph(edges_from_pairs(spark, GRAPH_MAIN), num_partitions=4)
    w = {r.id: r.value for r in pagerank(g, iterations=10, weighted=True).state.collect()}
    u = pagerank_oracle(GRAPH_MAIN, iterations=10)
    assert all(math.isclose(w[v], u[v], abs_tol=1e-9) for v in u)
    g.unpersist()
