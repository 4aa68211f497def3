"""Sampled betweenness centrality (Brandes, pivot-sampled) on the simple
undirected graph.

Added link-graph surface (no reference analogue): "which files sit on the
most dependency paths" — the classic broker-node query. Exact betweenness is
O(V·E); the standard scale answer (Brandes 2001 + Bader/Madduri sampling) is
k pivot sources, unbiasedly scaled by n/k.

Spark shape: ALL pivots advance in one level-synchronous loop — state is
keyed (pivot, id), so k BFS trees ride one frontier join per superstep
(message volume = Σ frontier degrees across pivots, map-side combined).
The backward dependency accumulation walks depths max→1 the same way. Total
supersteps = 2 × BFS depth, independent of k.

Pivots default to the k smallest vertex ids — DETERMINISTIC on purpose (the
oracle gate and tests replay it); pass explicit ``pivots`` for production
random sampling.

Memory envelope (measured, BENCH.md round 4): the per-depth sigma
aggregation's hash maps scale with |BFS level| / shuffle_partitions — on a
138 M sym-edge graph, 32 partitions OOM'd a 16 g JVM while 96 partitions
completed in 378 s. At scale, raise ``spark.sql.shuffle.partitions`` (or
the session default) FIRST; heap second.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from sparkgraph.graph import Graph
from sparkgraph.pregel import MAX_FIXPOINT_ITERS, PregelResult, SuperstepLoop, truncate_lineage


def betweenness_sampled(
    graph: Graph,
    k: int = 8,
    pivots: list[int] | None = None,
    normalize: bool = True,
    max_depth: int = MAX_FIXPOINT_ITERS,
) -> PregelResult:
    """Returns state ``(id, betweenness: double)`` — Brandes dependency sums
    from ``k`` pivot sources, scaled by n/k (unbiased estimator of the exact
    all-sources value; exact when the pivots cover every vertex).
    Endpoint convention: endpoints excluded (Brandes), undirected halving
    applied. ``normalize`` divides by (n-1)(n-2)/2."""
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
    loop = SuperstepLoop("betweenness", {"k": k, "normalize": normalize})

    # forward phase: (pivot, id, depth, sigma = #shortest paths)
    pivot_df = spark.createDataFrame([(p,) for p in pivots], "pivot long")
    state = truncate_lineage(
        pivot_df.select(
            "pivot", F.col("pivot").alias("id"), F.lit(0).alias("depth"),
            F.lit(1.0).alias("sigma"),
        )
    )
    frontier = state
    step = 0
    depth = 0
    while depth < max_depth:
        loop.step_started()
        msgs = sym.join(
            frontier.withColumnRenamed("id", "u").hint("shuffle_hash"), "u"
        ).select("pivot", F.col("v").alias("id"), "sigma")
        # candidate next level: path counts sum over predecessors
        cand = msgs.groupBy("pivot", "id").agg(F.sum("sigma").alias("sigma"))
        new = truncate_lineage(
            cand.join(state.select("pivot", "id"), ["pivot", "id"], "left_anti")
            .withColumn("depth", F.lit(depth + 1))
            .select("pivot", "id", "depth", "sigma")
        )
        n_new = new.count()
        step += 1
        loop.step_done(state, step, changed=n_new)
        if n_new == 0:
            break
        state = truncate_lineage(state.unionByName(new))
        frontier = new
        depth += 1

    # backward phase: delta(u) += sigma(u)/sigma(v) * (1 + delta(v)) over
    # tree edges u→v with depth(v) = depth(u)+1, walking depths max→1
    state = state.persist(StorageLevel.MEMORY_AND_DISK)
    delta = state.select("pivot", "id", F.lit(0.0).alias("delta"))
    su = state.select(
        "pivot", F.col("id").alias("u"), F.col("depth").alias("du"),
        F.col("sigma").alias("sigu"),
    )
    sv = state.select(
        "pivot", F.col("id").alias("v"), F.col("depth").alias("dv"),
        F.col("sigma").alias("sigv"),
    )
    tree = truncate_lineage(
        sym.join(su, "u")
        .join(sv, ["pivot", "v"])
        .filter(F.col("dv") == F.col("du") + 1)
        .select("pivot", "u", "v", "du", "dv", "sigu", "sigv")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    for d in range(depth - 1, -1, -1):
        loop.step_started()
        dl = delta.select(
            "pivot", F.col("id").alias("v"), F.col("delta").alias("dv_delta")
        )
        contrib = (
            tree.filter(F.col("du") == d)
            .join(dl, ["pivot", "v"])
            .groupBy("pivot", F.col("u").alias("id"))
            .agg(
                F.sum(
                    (F.col("sigu") / F.col("sigv")) * (1.0 + F.col("dv_delta"))
                ).alias("inc")
            )
        )
        delta = truncate_lineage(
            delta.join(contrib, ["pivot", "id"], "left").select(
                "pivot", "id",
                (F.col("delta") + F.coalesce("inc", F.lit(0.0))).alias("delta"),
            )
        )
        step += 1
        loop.step_done(delta, step)

    # exclude the pivot itself; undirected halving; n/k sampling scale-up
    scale = (n / float(k)) * 0.5
    bc = (
        delta.filter(F.col("id") != F.col("pivot"))
        .groupBy("id")
        .agg((F.sum("delta") * scale).alias("betweenness"))
    )
    out = verts.join(bc, "id", "left").select(
        "id", F.coalesce("betweenness", F.lit(0.0)).alias("betweenness")
    )
    if normalize:
        denom = (n - 1) * (n - 2) / 2.0
        out = out.select(
            "id", (F.col("betweenness") / F.lit(max(denom, 1.0))).alias("betweenness")
        )
    state.unpersist()
    tree.unpersist()
    sym.unpersist()
    return loop.finish(out, step, converged=True, result=out)
