"""Capture .explain("formatted") for the headline operators into
plans/r06/<name>_<tag>.txt (tag = before|after). Run from a checkout of the
round-start tree for "before" and the optimized tree for "after":

    python scripts/capture_plans.py after /root/repo/plans/r06

Iterative algorithms are loops of per-superstep plans; for those the file
holds the ONE superstep plan (state_k -> state_{k+1}) — the unit the
optimization actually changed — plus the kernel/pack plans where the
operator is an Arrow kernel rather than a SQL plan.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from sparkgraph.session import get_spark
from sparkgraph.graph import Graph
from sparkgraph.pregel import truncate_lineage
import __spark_entry__ as entrymod


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "after"
    outdir = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r06"
    )
    os.makedirs(outdir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("capture-plans")

    def dump(name: str, df) -> None:
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        with open(os.path.join(outdir, f"{name}_{tag}.txt"), "w") as f:
            f.write(buf.getvalue())
        print("wrote", name, flush=True)

    # -- pagerank superstep (bipartite) --------------------------------------
    g = Graph(entrymod.bipartite_edges(spark, sf_dir))
    edges = g.edges_sym
    edges.count()
    n = g.num_vertices
    state = truncate_lineage(
        g.vertices.join(g.degrees, "id").select(
            "id", F.col("deg").cast("double").alias("deg"), F.lit(0.0).alias("value")
        )
    )
    src_state = state.select(
        F.col("id").alias("src"), (F.col("value") / F.col("deg")).alias("contrib")
    )
    msgs = edges.join(src_state.hint("shuffle_hash"), "src").select(
        "dst", F.col("contrib").alias("msg")
    )
    sums = msgs.groupBy(F.col("dst").alias("id")).agg(F.sum("msg").alias("msum"))
    new_state = state.join(sums, "id", "left").select(
        "id", "deg",
        (F.lit(0.15 / n) + F.lit(0.85) * F.coalesce("msum", F.lit(0.0))).alias("value"),
    )
    dump("pagerank_superstep", new_state)

    # -- sssp superstep ------------------------------------------------------
    _INF = float("inf")
    sstate = truncate_lineage(
        g.vertices.select(
            "id",
            F.when(F.col("id") == 1, 0.0).otherwise(F.lit(_INF)).alias("dist"),
            (F.col("id") == 1).alias("changed"),
        )
    )
    frontier = sstate.filter("changed").select(
        F.col("id").alias("src"), F.col("dist").alias("fdist")
    )
    smsgs = edges.join(frontier.hint("shuffle_hash"), "src").select(
        F.col("dst").alias("id"), (F.col("fdist") + F.col("weight")).alias("msg")
    )
    mins = smsgs.groupBy("id").agg(F.min("msg").alias("mdist"))
    s_new = sstate.drop("changed").join(mins, "id", "left").select(
        "id",
        F.least("dist", F.coalesce("mdist", F.lit(_INF))).alias("dist"),
        (F.coalesce("mdist", F.lit(_INF)) < F.col("dist")).alias("changed"),
    )
    dump("sssp_superstep", s_new)

    # -- walks: hop-1 join + trace union -------------------------------------
    from sparkgraph.algorithms import random_walks

    dump("walks_trace", random_walks(g, 3))

    # -- triangles: oriented edge set (feeds every strategy) -----------------
    from sparkgraph.algorithms.triangles import oriented_edges

    gs = Graph(entrymod.supplier_edges(spark, sf_dir))
    dump("triangles_oriented", oriented_edges(gs))

    # -- minhash near-dup ----------------------------------------------------
    from sparkgraph.text import minhash_lsh_neardup_pairs, simhash, simhash_pairs

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    dump("dedup_minhash_docs", minhash_lsh_neardup_pairs(docs, threshold=0.5))
    dump("simhash_pairs_docs", simhash_pairs(simhash(docs)))

    # -- embedding near-dup --------------------------------------------------
    from sparkgraph.similarity import embedding_near_dup_pairs_lsh

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    dump("neardup_lsh_embed", embedding_near_dup_pairs_lsh(emb, threshold=0.4))

    # -- CSR pack input (the kernel itself is mapInArrow; this is the edge
    #    feed whose shuffle the optimization removed) ------------------------
    from sparkgraph.io.synth import powerlaw_edges

    gp = Graph(powerlaw_edges(spark, 200_000, 20_000))
    gp.edges_sym.count()
    try:
        from sparkgraph.kernels.csr import PackedGraph  # noqa: F401
        import inspect

        src = inspect.getsource(PackedGraph.__init__)
        feed = (
            gp.edges_sym.coalesce(2)
            if ".coalesce(" in src
            else gp.edges_sym.repartition(2, "src")
        )
    except Exception:
        feed = gp.edges_sym.repartition(2, "src")
    dump("csr_pack_feed", feed.select("src", "dst", "weight"))

    spark.stop()


if __name__ == "__main__":
    main()
