"""Minimum spanning forest via distributed Borůvka (Borůvka 1926; the
standard MapReduce/Pregel MST — e.g. Lattanzi et al., "Filtering: a method
for solving graph problems in MapReduce", SPAA 2011).

Added link-graph surface (no reference analogue): the MSF is the classic
backbone/cost-minimal-connectivity query — cheapest edge set keeping every
component connected (cluster backbones, dedup-graph sparsification,
single-linkage clustering's dendrogram skeleton).

Semantics (deterministic, replayable): edges are ordered by the STRICT total
order ``(weight, u, v)`` — the lexicographic perturbation makes the MSF
unique even with tied weights, so Borůvka here and Kruskal in the pytest
oracle provably agree edge-for-edge.

Scale shape per round: label edges with component ids (two hash joins),
per-component min-edge (one map-side-combined struct-min agg), then
pointer-jumping on the component pointer graph (each jump is one self-join
of a COMPONENT-sized table, which halves in size every outer round).
Components at least halve per round ⇒ O(log V) rounds; message volume is
frontier-like (only inter-component edges survive a round). No driver state
beyond two scalar counts per round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from sparkgraph.pregel import (
    MAX_FIXPOINT_ITERS,
    PregelResult,
    SuperstepLoop,
    truncate_lineage,
    warn_unconverged,
)


def minimum_spanning_forest(
    edges: DataFrame,
    weight_col: str = "weight",
    max_rounds: int = 64,
    max_jump: int = MAX_FIXPOINT_ITERS,
) -> PregelResult:
    """``edges(src, dst, weight)`` undirected → state ``(u, v, weight)``:
    the edges of the unique minimum spanning forest under the strict total
    order (weight, u, v). Parallel edges collapse to their minimum weight;
    self-loops are dropped (never in an MSF). One tree per connected
    component; |MSF| = V − #components."""
    e = (
        edges.select(
            F.least("src", "dst").alias("u"),
            F.greatest("src", "dst").alias("v"),
            F.col(weight_col).cast("double").alias("w"),
        )
        .filter(F.col("u") != F.col("v"))
        .groupBy("u", "v")
        .agg(F.min("w").alias("w"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    spark = edges.sparkSession
    loop = SuperstepLoop("mst", {"max_rounds": max_rounds})
    comp = truncate_lineage(
        e.select(F.col("u").alias("id"))
        .unionByName(e.select(F.col("v").alias("id")))
        .distinct()
        .select("id", F.col("id").alias("comp"))
    )
    mst = spark.createDataFrame([], "u long, v long, weight double")
    step = 0
    rounds = 0
    converged = False
    while rounds < max_rounds:
        loop.step_started()
        cu = comp.select(F.col("id").alias("u"), F.col("comp").alias("cu"))
        cv = comp.select(F.col("id").alias("v"), F.col("comp").alias("cv"))
        ce = truncate_lineage(
            e.join(cu.hint("shuffle_hash"), "u")
            .join(cv.hint("shuffle_hash"), "v")
            .filter(F.col("cu") != F.col("cv"))
            .select("u", "v", "w", "cu", "cv")
        )
        n_live = ce.count()
        step += 1
        rounds += 1
        loop.step_done(comp, step, changed=n_live)
        if n_live == 0:
            converged = True
            break
        # per-component minimum outgoing edge under the (w, u, v) total
        # order; ``other`` rides along as the pointer target
        cand = ce.select(
            F.col("cu").alias("c"), F.col("cv").alias("other"), "w", "u", "v"
        ).unionByName(
            ce.select(
                F.col("cv").alias("c"), F.col("cu").alias("other"), "w", "u", "v"
            )
        )
        best = (
            cand.groupBy("c")
            .agg(F.min(F.struct("w", "u", "v", "other")).alias("m"))
            .select(
                "c",
                F.col("m.u").alias("u"),
                F.col("m.v").alias("v"),
                F.col("m.w").alias("w"),
                F.col("m.other").alias("p"),
            )
        )
        best = truncate_lineage(best)
        chosen = best.select("u", "v", F.col("w").alias("weight")).distinct()
        mst = truncate_lineage(mst.unionByName(chosen))
        # pointer graph p(c): Borůvka + a strict total order guarantees every
        # cycle is a MUTUAL-min 2-cycle — break it by rooting the smaller id
        ptr = best.select("c", "p")
        pp = ptr.select(F.col("c").alias("p"), F.col("p").alias("pp"))
        ptr = truncate_lineage(
            ptr.join(pp, "p", "left").select(
                "c",
                F.when(
                    (F.col("pp") == F.col("c")) & (F.col("c") < F.col("p")),
                    F.col("c"),
                ).otherwise(F.col("p")).alias("p"),
            )
        )
        # pointer-jump to roots (component-sized table, log-depth)
        jumps = 0
        while jumps < max_jump:
            loop.step_started()
            nxt = ptr.select(F.col("c").alias("p"), F.col("p").alias("p2"))
            jumped = truncate_lineage(
                ptr.join(nxt, "p", "left").select(
                    "c", F.coalesce("p2", F.col("p")).alias("p")
                )
            )
            moved = (
                jumped.alias("a")
                .join(ptr.alias("b"), "c")
                .filter(F.col("a.p") != F.col("b.p"))
                .count()
            )
            step += 1
            jumps += 1
            loop.step_done(jumped, step, changed=moved)
            ptr = jumped
            if moved == 0:
                break
        # relabel every vertex to its component's new root
        comp = truncate_lineage(
            comp.join(
                ptr.select(F.col("c").alias("comp"), "p"), "comp", "left"
            ).select("id", F.coalesce("p", F.col("comp")).alias("comp"))
        )
    e.unpersist()
    if not converged:
        warn_unconverged("mst", rounds, max_rounds, knob="max_rounds", unit="rounds")
    out = mst.orderBy("u", "v")
    return loop.finish(out, step, converged, result=out)
