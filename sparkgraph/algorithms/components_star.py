"""Connected components via alternating large-star / small-star contraction
(Kiveris et al., "Connected Components in MapReduce and Beyond", 2014).

Why it exists next to the hash-min loop (components.py): hash-min converges
in O(diameter) supersteps — fine for social/link graphs, hopeless for
high-diameter structures (dependency chains, long file-rename lineages).
Star contraction converges in O(log² n) rounds regardless of diameter, at the
cost of a slightly heavier round (two star operations ≈ four shuffles).

Each round, every node u computes m(u) = min(Γ(u) ∪ {u}) and re-parents:
  large-star: every strictly-greater neighbor v > u re-attaches to m(u);
  small-star: every neighbor v ≤ u (and u itself) re-attaches to m(u).
The edge set converges to per-component stars rooted at the component min —
identical labels to the hash-min algorithm (equivalence-tested).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sparkgraph.graph import Graph
from sparkgraph.pregel import PregelResult, SuperstepLoop, truncate_lineage


def _sym(pairs: DataFrame) -> DataFrame:
    return pairs.select(F.col("a").alias("u"), F.col("b").alias("v")).unionByName(
        pairs.select(F.col("b").alias("u"), F.col("a").alias("v"))
    )


def _star(pairs: DataFrame, large: bool) -> DataFrame:
    """One star operation over the canonical pair set {(a > b)}."""
    sym = _sym(pairs)
    m = sym.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("m"))
    joined = sym.join(m, "u")
    if large:
        emitted = joined.filter(F.col("v") > F.col("u")).select(
            F.col("v").alias("x"), F.col("m").alias("y")
        )
    else:
        emitted = (
            joined.filter(F.col("v") <= F.col("u"))
            .select(F.col("v").alias("x"), F.col("m").alias("y"))
            .unionByName(m.select(F.col("u").alias("x"), F.col("m").alias("y")))
        )
    return (
        emitted.filter(F.col("x") != F.col("y"))
        .select(
            F.greatest("x", "y").alias("a"), F.least("x", "y").alias("b")
        )
        .distinct()
    )


def _fingerprint(pairs: DataFrame) -> tuple[int, int]:
    row = pairs.agg(
        F.count(F.lit(1)).alias("c"), F.bit_xor(F.xxhash64("a", "b")).alias("h")
    ).collect()[0]
    return int(row["c"] or 0), int(row["h"] or 0)


def connected_components_star(graph: Graph, max_iter: int = 50) -> PregelResult:
    """Returns ``(id, component)`` — identical to
    ``algorithms.connected_components`` in O(log²) rounds."""
    loop = SuperstepLoop("connected_components_star", {"max_iter": max_iter})
    verts = graph.vertices
    pairs = truncate_lineage(
        graph.simple_undirected().select(
            F.greatest("u", "v").alias("a"), F.least("u", "v").alias("b")
        )
    )
    fp = _fingerprint(pairs)
    step = 0
    converged = False
    while step < max_iter:
        loop.step_started()
        pairs = truncate_lineage(_star(_star(pairs, large=True), large=False))
        new_fp = _fingerprint(pairs)
        step += 1
        loop.step_done(pairs, step, changed=0 if new_fp == fp else 1)
        if new_fp == fp:
            converged = True
            break
        fp = new_fp

    # stars: every non-root (a) points at its component root (b); roots and
    # isolated-in-simple-graph vertices (self-loop-only) label themselves.
    # min-aggregate defends against a non-star edge set when max_iter cut the
    # fixpoint loop short (converged=False) — one label per vertex either way
    labels = pairs.groupBy(F.col("a").alias("id")).agg(
        F.min("b").alias("component")
    )
    state = verts.join(labels, "id", "left").select(
        "id", F.coalesce("component", "id").alias("component")
    )
    return loop.finish(state, step, converged, result=state)
