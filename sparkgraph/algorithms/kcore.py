"""k-core decomposition (iterative peeling) on the simple undirected graph.

No analogue in the reference (SURVEY.md §2C) — standard link-graph surface:
the k-core is the maximal subgraph where every vertex has degree ≥ k within
the subgraph. Peeling loop: drop vertices whose remaining-degree < k until a
fixpoint; each round is one aggregate + one semi-join (same superstep shape
as the Pregel loops, frontier = removed vertices).

``max_iter`` caps rounds for reproducible fixed-round semantics (pathological
chains need O(V) rounds; real link graphs converge in a handful).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sparkgraph.graph import Graph
from sparkgraph.pregel import PregelResult, SuperstepLoop, truncate_lineage


def k_core(graph: Graph, k: int, max_iter: int = 50) -> PregelResult:
    """Returns state ``(id,)`` — the vertices of the k-core (possibly empty)."""
    simple = graph.simple_undirected()  # (u < v), deduped, loop-free
    sym = simple.unionByName(
        simple.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).persist()
    loop = SuperstepLoop("k_core", {"k": k, "max_iter": max_iter})

    alive = truncate_lineage(sym.select(F.col("u").alias("id")).distinct())
    step = 0
    while step < max_iter:
        loop.step_started()
        live_edges = (
            sym.join(alive.withColumnRenamed("id", "u"), "u", "left_semi")
            .join(alive.withColumnRenamed("id", "v"), "v", "left_semi")
        )
        deg = live_edges.groupBy(F.col("u").alias("id")).agg(
            F.count(F.lit(1)).alias("deg")
        )
        survivors = truncate_lineage(deg.filter(F.col("deg") >= k).select("id"))
        n_before = alive.count()
        n_after = survivors.count()
        step += 1
        alive = survivors
        loop.step_done(alive, step, changed=n_before - n_after)
        if n_after == n_before or n_after == 0:
            break

    sym.unpersist()
    return loop.finish(alive, step, converged=True, result=alive)
