"""k-truss decomposition (edge-support peeling) on the simple graph.

Added link-graph surface (no reference analogue): the k-truss is the maximal
subgraph whose every edge sits in ≥ k−2 triangles of the subgraph — the
standard cohesive-subgraph notion one step stronger than k-core (Cohen 2008).
On a dependency graph it isolates genuinely interlocked module clusters
where plain components/cores over-merge.

Each peel round recounts support on the LIVE edge set via degree-oriented
triangle enumeration (oriented out-degree O(√E) — no hub wedge blow-up, the
same discipline as triangle_count/local_clustering), drops weak edges, and
stops at the fixpoint. Rounds ≤ peel depth; every round is a full triangle
pass, so this is the heaviest per-round operator in the engine — documented,
not hidden.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sparkgraph.graph import Graph
from sparkgraph.pregel import PregelResult, SuperstepLoop, truncate_lineage


def _triangle_corner_edges(e: DataFrame) -> DataFrame:
    """Canonical (u<v) simple edge set → one row per (triangle, member edge):
    columns (u, v). Enumeration is degree-oriented; output edges canonical."""
    deg = (
        e.select(F.col("u").alias("x"))
        .unionByName(e.select(F.col("v").alias("x")))
        .groupBy("x")
        .agg(F.count(F.lit(1)).alias("dx"))
    )
    ed = (
        e.join(deg.select(F.col("x").alias("u"), F.col("dx").alias("du")), "u")
        .join(deg.select(F.col("x").alias("v"), F.col("dx").alias("dv")), "v")
    )
    lower_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    o = ed.select(
        F.when(lower_first, F.col("u")).otherwise(F.col("v")).alias("a"),
        F.when(lower_first, F.col("v")).otherwise(F.col("u")).alias("b"),
    )
    ab = o.select(F.col("a").alias("ta"), F.col("b").alias("tb"))
    bc = o.select(F.col("a").alias("tb"), F.col("b").alias("tc"))
    ac = o.select(F.col("a").alias("ta"), F.col("b").alias("tc"))
    tri = ab.join(bc, "tb").join(ac, ["ta", "tc"])
    return (
        tri.select(F.least("ta", "tb").alias("u"), F.greatest("ta", "tb").alias("v"))
        .unionByName(
            tri.select(F.least("tb", "tc").alias("u"), F.greatest("tb", "tc").alias("v"))
        )
        .unionByName(
            tri.select(F.least("ta", "tc").alias("u"), F.greatest("ta", "tc").alias("v"))
        )
    )


def k_truss(graph: Graph, k: int, max_iter: int = 100) -> PregelResult:
    """Returns state ``(u, v)`` — the canonical edges of the k-truss (possibly
    empty). ``converged`` is True iff the peel reached its fixpoint within
    ``max_iter`` rounds."""
    if k < 2:
        raise ValueError("k-truss requires k >= 2")
    loop = SuperstepLoop("k_truss", {"k": k, "max_iter": max_iter})
    e = truncate_lineage(graph.simple_undirected())
    need = k - 2
    step = 0
    converged = False
    while step < max_iter:
        loop.step_started()
        support = _triangle_corner_edges(e).groupBy("u", "v").agg(
            F.count(F.lit(1)).alias("s")
        )
        kept = truncate_lineage(
            e.join(support, ["u", "v"], "left").filter(
                F.coalesce("s", F.lit(0)) >= need
            ).select("u", "v")
        )
        n_before = e.count()
        n_after = kept.count()
        step += 1
        loop.step_done(kept, step, changed=n_before - n_after)
        e = kept
        if n_after == n_before:
            converged = True
            break
        if n_after == 0:
            converged = True
            break

    return loop.finish(e, step, converged, result=e)
