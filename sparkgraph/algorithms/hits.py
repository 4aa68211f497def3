"""HITS (hubs & authorities) as iterative DataFrame joins.

Added link-graph surface (no analogue in the reference, SURVEY.md §2C). Runs
on the DIRECTED edge table (unlike PageRank, which follows the reference's
symmetrized-multigraph contract):

    auth ← Σ_{u→v} hub(u);   hub ← Σ_{u→v} auth(v);   L1-normalize each.

Fixed iterations (deterministic, SQL-expressible for the oracle gate);
L1 normalization keeps values scale-free and avoids overflow.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sparkgraph.pregel import PregelResult, SuperstepLoop, truncate_lineage


def hits(edges: DataFrame, iterations: int = 10) -> PregelResult:
    """``edges(src, dst)`` directed → state ``(id, hub, auth)`` for every
    endpoint; L1-normalized per iteration. Raises on an empty edge table; a
    degenerate side whose raw sum is 0 skips that side's normalization
    (values stay 0 rather than dividing to NaN)."""
    edges = edges.select("src", "dst").persist()
    if edges.isEmpty():
        edges.unpersist()
        raise ValueError("hits: empty edge table (no vertices to score)")
    verts = (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    loop = SuperstepLoop("hits", {"iterations": iterations})
    state = truncate_lineage(
        verts.select("id", F.lit(1.0).alias("hub"), F.lit(1.0).alias("auth"))
    )

    for step in range(1, iterations + 1):
        loop.step_started()
        # auth(v) = Σ hub(u) over u→v
        hubs = state.select(F.col("id").alias("src"), "hub")
        auth_sum = (
            edges.join(hubs.hint("shuffle_hash"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum("hub").alias("auth_raw"))
        )
        s1 = state.join(auth_sum, "id", "left").select(
            "id", "hub", F.coalesce("auth_raw", F.lit(0.0)).alias("auth")
        )
        # hub(u) = Σ auth(v) over u→v
        auths = s1.select(F.col("id").alias("dst"), F.col("auth").alias("a2"))
        hub_sum = (
            edges.join(auths.hint("shuffle_hash"), "dst")
            .groupBy(F.col("src").alias("id"))
            .agg(F.sum("a2").alias("hub_raw"))
        )
        s2 = s1.join(hub_sum, "id", "left").select(
            "id", F.coalesce("hub_raw", F.lit(0.0)).alias("hub"), "auth"
        )
        # truncate BEFORE the norm collect: the agg then materializes (and
        # caches) the superstep's joins once, and the normalized state is a
        # plain projection over the cached checkpoint — previously the agg
        # and the eager truncation each ran the full join pipeline (2×)
        s2 = truncate_lineage(s2, eager=False)
        sums = s2.agg(
            F.sum("hub").alias("sh"), F.sum("auth").alias("sa")
        ).collect()[0]
        sh = sums["sh"] or 0.0
        sa = sums["sa"] or 0.0
        state = s2.select(
            "id",
            (F.col("hub") / F.lit(sh)).alias("hub") if sh else F.col("hub"),
            (F.col("auth") / F.lit(sa)).alias("auth") if sa else F.col("auth"),
        )
        loop.step_done(state, step)

    edges.unpersist()
    return loop.finish(state, iterations, converged=True, result=state)
