"""Katz centrality (Katz 1953): x ← β + α·Aᵀx, fixed truncated iteration.

Added link-graph surface (no reference analogue): Katz scores count all walks
into a vertex with exponentially decaying weight α^len — the classic
"influence including distant upstream dependents" measure, complementary to
PageRank's random-surfer normalization (no degree division, so high-degree
neighbors are not diluted).

Truncated fixed-iteration form (x₀ = 0): after T supersteps the score equals
Σ_{l=1..T} α^(l-1)·β·(#walks of length l-1 into v ... ) — exactly the degree-T
Taylor prefix of (I − αAᵀ)⁻¹β𝟙. Convergence of the full series needs
α < 1/λ_max; the truncated form is well-defined for any α and is what the
gate pins. Same scatter/gather plan shape as pagerank: persisted
pre-partitioned symmetrized edges never re-exchange; state builds the hash
side (``hint("shuffle_hash")``); per-superstep map-side partial aggregation;
lineage truncated lazily so the fixed-iteration loop runs as one job.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sparkgraph.graph import Graph
from sparkgraph.pregel import PregelResult, SuperstepLoop, truncate_lineage


def katz_centrality(
    graph: Graph,
    alpha: float = 0.05,
    beta: float = 1.0,
    iterations: int = 10,
    eager_checkpoint: bool = False,
) -> PregelResult:
    """Returns state ``(id, value)`` — truncated Katz scores on the
    symmetrized multigraph (parallel edges count, matching pagerank's
    degree semantics)."""
    n = graph.num_vertices
    if n == 0:
        raise ValueError("graph has no vertices (empty or comment-only input)")
    edges = graph.edges_sym
    loop = SuperstepLoop(
        "katz", {"alpha": alpha, "beta": beta, "iterations": iterations}
    )
    state = truncate_lineage(
        graph.vertices.select("id", F.lit(0.0).alias("value"))
    )
    step = 0
    while step < iterations:
        loop.step_started()
        step += 1
        src_state = state.select(F.col("id").alias("src"), F.col("value").alias("contrib"))
        msgs = edges.join(src_state.hint("shuffle_hash"), "src").select(
            "dst", F.col("contrib").alias("msg")
        )
        sums = msgs.groupBy(F.col("dst").alias("id")).agg(F.sum("msg").alias("msum"))
        state = state.join(sums, "id", "left").select(
            "id",
            (F.lit(beta) + F.lit(alpha) * F.coalesce("msum", F.lit(0.0))).alias(
                "value"
            ),
        )
        # lazy runs truncate every second superstep (see pagerank: same
        # cadence measurement); eager keeps per-superstep truncation
        if eager_checkpoint or step % 2 == 0 or step >= iterations:
            state = truncate_lineage(state, eager=eager_checkpoint)
        loop.step_done(state, step)
    return loop.finish(state, step, True, result=state.select("id", "value"))
