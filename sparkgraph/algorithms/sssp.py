"""Single-source shortest paths as a frontier-driven min-plus Pregel loop.

Implements the *intended* semantics of the reference's SSSP vertex program
(worker/sssp.go:20-44): init dist(source)=0, dist(v)=+∞, relax
``min(dist(u) + w(u,v))`` each superstep, halt when no distance improves.
The shipped reference code path is inert — vertices init to 0 instead of +∞
(worker/worker.go:174,205) and the source id is never forwarded
(master/master.go:271-292) — see SURVEY.md §2-note-2; we implement the
Malewicz et al. 2010 §5.2 semantics the reference cites (README.md:2).

With the loader's unit weights (worker/worker.go:165) this is BFS hop count
on the symmetrized graph. Unreachable vertices keep dist=+∞ (Infinity).

Scale notes: only the *frontier* (vertices improved last superstep) scatters —
the message volume is O(frontier out-degree), not O(E), per superstep; the
edge table stays partitioned by src across all supersteps.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sparkgraph.graph import Graph
from sparkgraph.pregel import (
    MAX_FIXPOINT_ITERS,
    Checkpointer,
    PregelResult,
    SuperstepLoop,
    truncate_lineage,
    warn_unconverged,
)

_INF = float("inf")


def sssp(
    graph: Graph,
    source: int,
    max_iter: int = MAX_FIXPOINT_ITERS,
    checkpointer: Checkpointer | None = None,
    resume: bool = False,
    track_parents: bool = False,
) -> PregelResult:
    """Returns state ``(id, dist: double)`` — +∞ for unreachable vertices.

    ``track_parents``: adds a ``parent`` column (shortest-path tree — follow
    parents to reconstruct the path). Deterministic: a vertex's parent is set
    when its distance strictly improves, to the smallest-id predecessor among
    that superstep's best proposals (min over the (dist, src) pair); the
    source and unreachable vertices carry NULL."""
    spark = graph.spark
    edges = graph.edges_sym
    loop = SuperstepLoop("sssp", {"source": source}, checkpointer, resume)

    state_cols = ["id", "dist", "changed"] + (["parent"] if track_parents else [])
    restored = loop.try_resume(spark)
    if restored is not None:
        start_step, state = restored
        state = truncate_lineage(state.select(*state_cols))
    else:
        start_step = 0
        init = graph.vertices.select(
            "id",
            F.when(F.col("id") == source, 0.0).otherwise(F.lit(_INF)).alias("dist"),
            (F.col("id") == source).alias("changed"),
        )
        if track_parents:
            init = init.withColumn("parent", F.lit(None).cast("long"))
        state = truncate_lineage(init)

    step = start_step
    converged = False
    while step < max_iter:
        loop.step_started()
        frontier = state.filter("changed").select(
            F.col("id").alias("src"), F.col("dist").alias("fdist")
        )
        # Scatter from the frontier only: propose dist + weight to neighbors.
        msgs = edges.join(frontier.hint("shuffle_hash"), "src").select(
            F.col("dst").alias("id"),
            (F.col("fdist") + F.col("weight")).alias("msg"),
            F.col("src").alias("via"),
        )
        if track_parents:
            # min over (msg, via): best distance, smallest-id predecessor
            mins = msgs.groupBy("id").agg(
                F.min(F.struct("msg", "via")).alias("m")
            ).select("id", F.col("m.msg").alias("mdist"), F.col("m.via").alias("mvia"))
        else:
            mins = msgs.groupBy("id").agg(F.min("msg").alias("mdist"))
        improved = F.coalesce("mdist", F.lit(_INF)) < F.col("dist")
        sel = [
            F.col("id"),
            F.least("dist", F.coalesce("mdist", F.lit(_INF))).alias("dist"),
            improved.alias("changed"),
        ]
        if track_parents:
            sel.append(F.when(improved, F.col("mvia")).otherwise(F.col("parent")).alias("parent"))
        new_state = state.drop("changed").join(mins, "id", "left").select(*sel)
        # lazy truncation: the changed-count below is the superstep's one
        # action — it materializes (and caches) the checkpointed state, so
        # each superstep runs as ONE Spark job instead of checkpoint + count
        new_state = truncate_lineage(new_state, eager=False)
        changed = new_state.filter("changed").count()
        step += 1
        state = new_state
        loop.step_done(state, step, changed=changed)
        if changed == 0:
            converged = True
            break

    if not converged:
        warn_unconverged("sssp", step, max_iter)
    result_cols = ["id", "dist"] + (["parent"] if track_parents else [])
    return loop.finish(state, step, converged, result=state.select(*result_cols))
