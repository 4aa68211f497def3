"""Sampled harmonic closeness centrality on the simple undirected graph.

Added link-graph surface (no reference analogue; completes the centrality
family next to PageRank/HITS/betweenness): harmonic centrality
``H(v) = Σ_{u≠v} 1/d(u,v)`` handles disconnected graphs gracefully
(unreachable pairs contribute 0 instead of poisoning the mean), which is the
right variant for a link graph with many components (Boldi & Vigna 2014,
"Axioms for centrality").

Exact H is all-pairs BFS — O(V·E). The scale path is the same pivot-sampling
trick as betweenness: k sources, unbiased scale-up by n/k, and ALL pivots
advance in ONE level-synchronous frontier loop (state keyed (pivot, id), so
supersteps = BFS depth, independent of k). Pivots default to the k smallest
ids — deterministic so the oracle gate can replay them; pass random pivots in
production.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from sparkgraph.graph import Graph
from sparkgraph.pregel import MAX_FIXPOINT_ITERS, PregelResult, SuperstepLoop, truncate_lineage


def harmonic_closeness_sampled(
    graph: Graph,
    k: int = 8,
    pivots: list[int] | None = None,
    normalize: bool = True,
    max_depth: int = MAX_FIXPOINT_ITERS,
) -> PregelResult:
    """Returns state ``(id, closeness: double)`` — ``(n/k)·Σ_{p∈pivots, p≠v}
    1/d(p,v)``, exact when the pivots cover every vertex; ``normalize``
    divides by (n-1) (the max possible H, all vertices adjacent)."""
    spark = graph.spark
    simple = graph.simple_undirected()
    sym = truncate_lineage(
        simple.unionByName(
            simple.select(F.col("v").alias("u"), F.col("u").alias("v"))
        ).repartition(graph.num_partitions, "u")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    verts = sym.select(F.col("u").alias("id")).distinct()
    n = verts.count()
    if n == 0:
        raise ValueError("graph has no vertices")
    if pivots is None:
        pivots = [r.id for r in verts.orderBy("id").limit(k).collect()]
    k = len(pivots)
    loop = SuperstepLoop("closeness", {"k": k, "normalize": normalize})

    pivot_df = spark.createDataFrame([(p,) for p in pivots], "pivot long")
    state = truncate_lineage(
        pivot_df.select("pivot", F.col("pivot").alias("id"), F.lit(0).alias("depth"))
    )
    frontier = state
    step = 0
    depth = 0
    while depth < max_depth:
        loop.step_started()
        cand = (
            sym.join(frontier.withColumnRenamed("id", "u").hint("shuffle_hash"), "u")
            .select("pivot", F.col("v").alias("id"))
            .distinct()
        )
        new = truncate_lineage(
            cand.join(state.select("pivot", "id"), ["pivot", "id"], "left_anti")
            .withColumn("depth", F.lit(depth + 1))
        )
        n_new = new.count()
        step += 1
        loop.step_done(state, step, changed=n_new)
        if n_new == 0:
            break
        state = truncate_lineage(state.unionByName(new))
        frontier = new
        depth += 1

    scale = n / float(k)
    h = (
        state.filter(F.col("depth") > 0)
        .groupBy("id")
        .agg((F.sum(1.0 / F.col("depth")) * scale).alias("closeness"))
    )
    out = verts.join(h, "id", "left").select(
        "id", F.coalesce("closeness", F.lit(0.0)).alias("closeness")
    )
    if normalize:
        out = out.select(
            "id", (F.col("closeness") / F.lit(max(n - 1, 1))).alias("closeness")
        )
    sym.unpersist()
    return loop.finish(out, step, converged=True, result=out)


def eccentricity_sampled(
    graph: Graph,
    k: int = 8,
    pivots: list[int] | None = None,
    max_depth: int = MAX_FIXPOINT_ITERS,
) -> PregelResult:
    """Per-pivot eccentricity (max BFS depth within the pivot's component) via
    the same one-loop multi-pivot BFS; ``max(eccentricity)`` over the sample
    is the standard LOWER bound on the graph diameter (exact when a
    peripheral vertex is sampled). Returns state ``(pivot, eccentricity)``."""
    spark = graph.spark
    simple = graph.simple_undirected()
    sym = truncate_lineage(
        simple.unionByName(
            simple.select(F.col("v").alias("u"), F.col("u").alias("v"))
        ).repartition(graph.num_partitions, "u")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    verts = sym.select(F.col("u").alias("id")).distinct()
    if verts.count() == 0:
        raise ValueError("graph has no vertices")
    if pivots is None:
        pivots = [r.id for r in verts.orderBy("id").limit(k).collect()]
    loop = SuperstepLoop("eccentricity", {"k": len(pivots)})

    pivot_df = spark.createDataFrame([(p,) for p in pivots], "pivot long")
    state = truncate_lineage(
        pivot_df.select("pivot", F.col("pivot").alias("id"), F.lit(0).alias("depth"))
    )
    frontier = state
    step = 0
    depth = 0
    while depth < max_depth:
        loop.step_started()
        cand = (
            sym.join(frontier.withColumnRenamed("id", "u").hint("shuffle_hash"), "u")
            .select("pivot", F.col("v").alias("id"))
            .distinct()
        )
        new = truncate_lineage(
            cand.join(state.select("pivot", "id"), ["pivot", "id"], "left_anti")
            .withColumn("depth", F.lit(depth + 1))
        )
        n_new = new.count()
        step += 1
        loop.step_done(state, step, changed=n_new)
        if n_new == 0:
            break
        state = truncate_lineage(state.unionByName(new))
        frontier = new
        depth += 1

    out = state.groupBy("pivot").agg(F.max("depth").alias("eccentricity"))
    sym.unpersist()
    return loop.finish(out, step, converged=True, result=out)
