"""SSSP/CC CSR kernels ≡ relational algorithms."""

import math

from sparkgraph.algorithms import connected_components, sssp
from sparkgraph.graph import Graph
from sparkgraph.io.edgelist import edges_from_pairs
from sparkgraph.io.synth import powerlaw_edges
from sparkgraph.kernels import cc_csr, sssp_csr

from tests.fixtures import GRAPH_MAIN


def test_sssp_csr_equals_relational(spark):
    g = Graph(edges_from_pairs(spark, GRAPH_MAIN), num_partitions=4)
    rel = {r.id: r.dist for r in sssp(g, source=1).state.collect()}
    csr = {r.id: r.dist for r in sssp_csr(g, source=1).state.collect()}
    assert set(rel) == set(csr)
    for v in rel:
        assert (math.isinf(rel[v]) and math.isinf(csr[v])) or rel[v] == csr[v]
    g.unpersist()


def test_sssp_csr_weighted(spark):
    edges = spark.createDataFrame(
        [(1, 3, 5.0), (1, 2, 1.0), (2, 3, 1.0)], "src long, dst long, weight double"
    )
    g = Graph(edges, num_partitions=2)
    got = {r.id: r.dist for r in sssp_csr(g, source=1).state.collect()}
    assert got == {1: 0.0, 2: 1.0, 3: 2.0}
    g.unpersist()


def test_sssp_csr_absent_source(spark):
    g = Graph(edges_from_pairs(spark, GRAPH_MAIN), num_partitions=4)
    got = {r.id: r.dist for r in sssp_csr(g, source=999).state.collect()}
    assert all(math.isinf(d) for d in got.values())
    g.unpersist()


def test_cc_csr_equals_relational_fixture_and_powerlaw(spark):
    for edges in (
        edges_from_pairs(spark, GRAPH_MAIN),
        powerlaw_edges(spark, 5_000, 800),
    ):
        g = Graph(edges, num_partitions=4)
        rel = {r.id: r.component for r in connected_components(g).state.collect()}
        csr = {r.id: r.component for r in cc_csr(g).state.collect()}
        assert rel == csr
        g.unpersist()
