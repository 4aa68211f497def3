"""Densest-subgraph 2(1+ε)-approximation (Bahmani, Kumar, Vassilvitskii 2012).

Added link-graph surface (no reference analogue): "the most tightly
interconnected module cluster" — on a dependency graph this surfaces the
entangled core that refactoring work should target first.

The algorithm is the canonical bulk-parallel peel: repeatedly delete EVERY
vertex whose degree is ≤ (1+ε)·(2m/n) (the average degree of the live
subgraph), track the density m/n of every intermediate subgraph, and return
the best one — provably ≥ OPT/(2(1+ε)) in O(log₁₊ε n) rounds, each a single
degree aggregation + semi-join. Deterministic for fixed ε: ties between
equal-density rounds resolve to the earliest round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sparkgraph.graph import Graph
from sparkgraph.pregel import PregelResult, SuperstepLoop, truncate_lineage


def densest_subgraph(
    graph: Graph, epsilon: float = 0.1, max_iter: int = 200
) -> PregelResult:
    """Returns state ``(id,)`` — the vertices of the densest intermediate
    subgraph (density = edges/vertices on the simple graph). ``converged``
    is True iff the peel emptied the graph within ``max_iter`` rounds.
    ``metrics[r].delta`` records round r's density."""
    loop = SuperstepLoop("densest_subgraph", {"epsilon": epsilon})
    e = truncate_lineage(graph.simple_undirected())
    rounds: list[tuple[float, DataFrame]] = []  # (density, vertex set)
    step = 0
    converged = False
    while step < max_iter:
        loop.step_started()
        deg = (
            e.select(F.col("u").alias("id"))
            .unionByName(e.select(F.col("v").alias("id")))
            .groupBy("id")
            .agg(F.count(F.lit(1)).alias("deg"))
        )
        # lazy: the count materializes the checkpoint (one job, not two)
        deg = truncate_lineage(deg, eager=False)
        n = deg.count()
        if n == 0:
            converged = True
            break
        m = e.count()
        density = m / n
        rounds.append((density, deg.select("id")))
        threshold = (1.0 + epsilon) * (2.0 * m / n)
        keep = deg.filter(F.col("deg") > threshold).select("id")
        e = truncate_lineage(
            e.join(keep.withColumnRenamed("id", "u"), "u", "left_semi")
            .join(keep.withColumnRenamed("id", "v"), "v", "left_semi")
            .select("u", "v")
        )
        step += 1
        loop.step_done(e, step, delta=density)

    if not rounds:  # edgeless graph: round 0 saw n == 0, nothing was recorded
        empty = e.select(F.col("u").alias("id")).limit(0)
        return loop.finish(empty, step, True, result=empty)
    best_density, best_verts = max(
        enumerate(rounds), key=lambda t: (t[1][0], -t[0])
    )[1]
    out = best_verts
    return loop.finish(out, step, converged, result=out)
