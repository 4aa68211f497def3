"""End-to-end CODE-payload pipeline — the north-rule input shape, start to
finish (BASELINE.json input_hint: sources(repo, path, commit, lang, content)).

Chains the code-mining surface the way a repository-analytics job over an
Iceberg source table would, with the expensive artifacts built once:

  1. ingest            (xxhash64 file ids; sha256(content) invariant VERIFIED
                        — the input_hint's per-row contract)
  2. edge derivation   (vectorized pandas-UDF import extraction resolved
                        against same-repo path stems; capped commit
                        co-change self-join)
  3. coupling metrics  (Martin ca/ce/instability per file — which modules
                        are load-bearing vs volatile)
  4. co-change rules   (support/confidence per ordered file pair,
                        Zimmermann et al. ICSE 2004 — "when A changes,
                        B changes too")
  5. graph analytics   (PageRank file importance over import ∪ cochange,
                        components, triangles — the reference engine's job
                        surface on the derived graph)
  6. versioned publish (scores table PUT through TableIO — the SDFS
                        replacement; re-runs append snapshots)

Every stage is a DataFrame plan (one pandas UDF for regex extraction, the
rest JVM-side); at 10^12-file scale the same code runs with the synthetic
source replaced by `spark.read.table("catalog.db.sources")`.

Usage:
    python examples/codegraph_pipeline.py
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from sparkgraph.session import get_spark
from sparkgraph.graph import Graph
from sparkgraph.algorithms import connected_components, pagerank, top_k
from sparkgraph.algorithms.triangles import triangle_count
from sparkgraph.derive import (
    cochange_rules,
    coupling_metrics,
    derive_code_edges,
    derive_import_edges,
)
from sparkgraph.ingest import commit_memberships, ingest_sources, verify_sha_invariant
from sparkgraph.io.synth import synthesize_sources
from sparkgraph.io.tables import TableIO


def main() -> None:
    spark = get_spark("codegraph-pipeline", master="local[8]", shuffle_partitions=8)

    # 1. ingest + per-row invariant
    src = synthesize_sources(spark, n_repos=8, files_per_repo=60)
    verts = ingest_sources(src).persist()
    bad = verify_sha_invariant(src, verts)
    print(f"[1] ingested {verts.count()} files; sha256 mismatches: {bad}")
    assert bad == 0

    # 2. derived edges
    imports = derive_import_edges(verts).persist()
    mem = commit_memberships(src)
    edges = derive_code_edges(verts, mem, max_commit_files=30)
    print(f"[2] import edges: {imports.count()}, total edges: {edges.count()}")

    # 3. coupling: the most depended-upon (stable) and most unstable files
    coup = coupling_metrics(imports, verts)
    print("[3] highest fan-in (load-bearing) files:")
    coup.orderBy(F.desc("ca"), "repo", "path").select(
        "repo", "path", "ca", "ce", "instability"
    ).show(5, truncate=False)

    # 4. co-change rules: strongest "change A -> change B" signals
    rules = cochange_rules(mem, max_commit_files=30, min_support=2)
    named = (
        rules.join(verts.select(F.col("id").alias("src"), "repo",
                                F.col("path").alias("path_a")), "src")
        .join(verts.select(F.col("id").alias("dst"),
                           F.col("path").alias("path_b")), "dst")
    )
    print("[4] strongest co-change rules:")
    named.orderBy(F.desc("confidence"), F.desc("support"), "path_a", "path_b").select(
        "repo", "path_a", "path_b", "support", "confidence"
    ).show(5, truncate=False)

    # 5. graph analytics over import ∪ cochange
    g = Graph(edges.select("src", "dst"))
    pr = pagerank(g, mode="convergence", tol=1e-6)
    scores = pr.state.join(verts.select("id", "repo", "path"), "id")
    print(f"[5] PageRank converged in {pr.supersteps} supersteps; top files:")
    top_k(scores.select("id", "value"), 5).join(
        verts.select("id", "repo", "path"), "id"
    ).orderBy(F.desc("value")).show(truncate=False)
    cc = connected_components(g)
    n_comp = cc.state.select("component").distinct().count()
    tri = triangle_count(g)
    print(f"    components: {n_comp}, triangles: {tri}")

    # 6. versioned publish
    with tempfile.TemporaryDirectory() as d:
        io = TableIO(spark, d)
        io.save(scores.select("repo", "path", "value"), "file_scores")
        io.save(scores.select("repo", "path", "value"), "file_scores")  # v2
        print(f"[6] published snapshots: {[r['version'] for r in io.snapshots('file_scores').collect()]}")

    g.unpersist()
    verts.unpersist()
    imports.unpersist()
    spark.stop()
    print("PIPELINE OK")


if __name__ == "__main__":
    main()
