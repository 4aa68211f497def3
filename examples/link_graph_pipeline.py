"""End-to-end link-graph analytics pipeline — the reference engine's whole
job surface (and the added analytics) on one graph, Spark-first.

Builds the customer-supplier bipartite graph from the TPC-H-ish tables, then
runs the classic stack: PageRank (reference + convergence), SSSP, connected
components, label propagation, triangles — plus the round-3 additions (Katz,
motif counts, snapshot diff, reciprocity) — and versions the scores table
through TableIO (the SDFS PUT/GET/LS replacement).

Usage:
    python examples/link_graph_pipeline.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from sparkgraph.session import get_spark
from sparkgraph.algorithms import (
    connected_components,
    katz_centrality,
    label_propagation,
    pagerank,
    sssp,
    top_k,
    triangle_count,
)
from sparkgraph.algorithms.triangles import four_clique_count, triangle_list
from sparkgraph.graph import Graph, butterfly_count, graph_diff, reciprocity
from sparkgraph.io.tables import TableIO


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("link-graph-pipeline", master="local[8]", shuffle_partitions=8)
    l = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    o = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    edges = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .select(
            F.col("o_custkey").alias("src"),
            (F.col("l_suppkey") + 1_000_000).alias("dst"),
        )
        .distinct()
    )
    g = Graph(edges)
    print(f"graph: {g.num_vertices} vertices, {g.edges_sym.count()} sym edges")

    pr = pagerank(g, mode="reference", iterations=10)
    print("top-5 pagerank:")
    top_k(pr.state, 5).show()
    conv = pagerank(g, mode="convergence", tol=1e-6)
    print(f"convergence-mode: {conv.supersteps} supersteps to 1e-6")

    d = sssp(g, source=1)
    n_reached = d.state.filter(F.col("dist") < float("inf")).count()
    print(f"sssp: reached {n_reached} vertices")
    cc = connected_components(g)
    print(f"components: {cc.state.select('component').distinct().count()}")
    lpa = label_propagation(g, max_iter=5)
    print(f"lpa labels: {lpa.state.select('label').distinct().count()}")
    kz = katz_centrality(g, alpha=0.005, iterations=10)
    print(f"katz max: {kz.state.agg(F.max('value')).collect()[0][0]:.6f}")
    from sparkgraph.algorithms.louvain import louvain
    from sparkgraph.algorithms.structure import modularity

    communities = louvain(g, rounds_per_level=4, max_levels=2)
    n_comm = communities.state.select("label").distinct().count()
    q = modularity(g, communities.state).collect()[0][0]
    print(f"louvain: {n_comm} communities, modularity {q:.4f}")

    print(f"triangles: {triangle_count(g)}")
    print(f"4-cliques: {four_clique_count(g).collect()[0].n_four_cliques}")
    print(f"butterflies: {butterfly_count(edges).collect()[0].n_butterflies}")
    print(f"triangle rows listed: {triangle_list(g).count()}")
    rec = reciprocity(g.edges_sym).collect()[0]
    print(f"reciprocity on symmetrized view: {rec.reciprocity}")

    # version the scores, mutate the graph, diff the snapshots
    import tempfile

    with tempfile.TemporaryDirectory() as root:
        tio = TableIO(spark, root)
        v1 = tio.save(pr.state, "pagerank_scores")
        v2 = tio.save(conv.state, "pagerank_scores")
        print(f"score versions: {tio.versions('pagerank_scores')} (latest v{v2}, time travel to v{v1})")
        old_scores = tio.load("pagerank_scores", version=v1)
        print(f"v1 rows via time travel: {old_scores.count()}")

    newer = edges.filter((F.col("src") + F.col("dst")) % 11 != 0)
    diff = graph_diff(edges, newer)
    n_diff = diff.count()
    n_removed = diff.filter(F.col("change") == "removed").count()
    print(f"snapshot diff rows: {n_diff} (all 'removed': {n_removed == n_diff})")
    spark.stop()


if __name__ == "__main__":
    main()
