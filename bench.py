"""Headline benchmark: runs the engine's flagship jobs at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric", "value", "unit", "queries", "sf", "extra"}.

Headliners (chosen to mirror BASELINE.md's published experiment — iterative
PageRank throughput — plus the operators that stress shuffle/skew):
  pagerank10_bipartite   10 supersteps on the sf bipartite graph
  pagerank10_powerlaw    10 supersteps on a seeded power-law graph (hub skew)
  sssp_bipartite         BFS to fixpoint
  cc_bipartite           hash-min to fixpoint
  triangles_suppliers    oriented wedge join
  dedup_minhash_docs     MinHash-LSH near-dup: banded candidates + exact
                         Jaccard verify (the gated scale path; r1 measured
                         the estimate-only variant — slightly lighter)
  simhash_pairs_docs     Hamming-banded SimHash near-dup pairs
  neardup_lsh_embed      banded hyperplane-LSH + exact-cosine verify
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sparkgraph.session import get_spark
from sparkgraph.graph import Graph
from sparkgraph.algorithms import pagerank, sssp, connected_components
from sparkgraph.algorithms.triangles import triangle_count
from sparkgraph.io.synth import powerlaw_edges
from sparkgraph.text import minhash_lsh_neardup_pairs, simhash, simhash_pairs
import __spark_entry__ as entrymod

POWERLAW_EDGES = int(os.environ.get("BENCH_POWERLAW_EDGES", 2_000_000))
POWERLAW_VERTS = int(os.environ.get("BENCH_POWERLAW_VERTS", 200_000))
# Noise defence (this box varies up to ~5x run-to-run; the dominant mode is
# multi-second first-touch page-fault stalls from the virtualized host, which
# hit whichever attempt allocates fresh memory): every headline is best-of-N
# with the plan REBUILT fresh each attempt — Spark 4.x reuses a completed
# result for the SAME DataFrame object, so each fn() must (and does)
# construct its plan from scratch; re-collecting a stored df would time
# nothing. Best-of-3 because a single stall can poison two attempts in a row.
BENCH_REPEATS = int(os.environ.get("BENCH_REPEATS", 3))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    spark = get_spark("sparkgraph-bench")
    timings: dict[str, float] = {}
    extra: dict[str, float] = {}

    def timed(name, fn, repeats: int = BENCH_REPEATS):
        out, best = None, float("inf")
        for _ in range(max(repeats, 1)):
            t0 = time.monotonic()
            out = fn()
            best = min(best, time.monotonic() - t0)
        timings[name] = round(best, 3)
        return out

    # -- bipartite graph jobs ------------------------------------------------
    g_bip = Graph(entrymod.bipartite_edges(spark, sf_dir))
    n_edges_bip = g_bip.edges_sym.count()  # materializes the persisted sym view
    # untimed warm-up: exercises the full superstep machinery (codegen,
    # shuffle service, checkpoint dirs) before the first timed attempt
    pagerank(g_bip, mode="reference", iterations=2).state.count()

    timed("pagerank10_bipartite", lambda: pagerank(g_bip, mode="reference", iterations=10).state.count())
    extra["pagerank_bipartite_edges_per_sec"] = round(
        10 * n_edges_bip / timings["pagerank10_bipartite"], 1
    )
    extra["pagerank_bipartite_supersteps_per_sec"] = round(
        10 / timings["pagerank10_bipartite"], 3
    )
    timed("sssp_bipartite", lambda: sssp(g_bip, source=1).state.count())
    timed("cc_bipartite", lambda: connected_components(g_bip).state.count())

    # -- power-law (hub-skew) PageRank ---------------------------------------
    g_pl = Graph(powerlaw_edges(spark, POWERLAW_EDGES, POWERLAW_VERTS))
    n_edges_pl = g_pl.edges_sym.count()
    timed("pagerank10_powerlaw", lambda: pagerank(g_pl, mode="reference", iterations=10).state.count())
    extra["pagerank_powerlaw_edges_per_sec"] = round(
        10 * n_edges_pl / timings["pagerank10_powerlaw"], 1
    )
    from sparkgraph.kernels import pagerank_csr

    timed("pagerank10_csr_powerlaw", lambda: pagerank_csr(g_pl, mode="reference", iterations=10).state.count())
    extra["pagerank_csr_powerlaw_edges_per_sec"] = round(
        10 * n_edges_pl / timings["pagerank10_csr_powerlaw"], 1
    )

    # -- random-walk corpus on the hub-skewed graph ---------------------------
    # one walk per vertex; the per-hop (src, idx) equi-join picks exactly one
    # adjacency row per walker, so hub degree never amplifies the join
    from sparkgraph.algorithms import random_walks

    timed("walks10_powerlaw", lambda: random_walks(g_pl, 10).count())
    extra["walk_hops_per_sec"] = round(
        10 * POWERLAW_VERTS / timings["walks10_powerlaw"], 1
    )

    # -- supplier triangles + document dedup ---------------------------------
    g_sup = Graph(entrymod.supplier_edges(spark, sf_dir))
    timed("triangles_suppliers", lambda: triangle_count(g_sup))
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    timed("dedup_minhash_docs", lambda: minhash_lsh_neardup_pairs(docs, threshold=0.5).count())
    timed("simhash_pairs_docs", lambda: simhash_pairs(simhash(docs)).count())

    from sparkgraph.similarity import embedding_near_dup_pairs_lsh

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    timed("neardup_lsh_embed", lambda: embedding_near_dup_pairs_lsh(emb, threshold=0.4).count())

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_total_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "extra": extra,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
