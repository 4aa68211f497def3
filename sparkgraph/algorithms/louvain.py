"""Louvain-style community detection: synchronous modularity-gain label
moving (the parallel "phase 1" of Blondel et al. 2008, as distributed
engines run it — Grappolo/distributed-Louvain style).

Added link-graph surface (no reference analogue): modularity-seeking
communities are the standard upgrade over plain LPA (which this engine also
ships) — on a dependency graph they recover module boundaries instead of
flood-fill label majorities.

Semantics (deterministic, replayable): every vertex simultaneously evaluates
moving to each NEIGHBORING community (or staying), using the standard
modularity gain with itself removed from its current community, and adopts
the argmax. Runs a FIXED number of rounds — synchronous moving can oscillate
on symmetric structures (documented Louvain-parallelization caveat), so the
contract is "K deterministic rounds", not "converged optimum"; pair with
``structure.modularity`` to score the result, and keep the best round if
oscillation matters.

Exactness discipline (what makes this oracle-gateable): with integer edge
multiplicities the gain comparison is scaled by 2m into PURE INTEGER math —
  gain(c) = 2m·k_{v,c} − γ̂·k_v·(Σ_c − [c = own]·k_v)
(γ̂ = 1) — so argmax + smallest-community tie-break is bit-identical across
engines; no float ulp can flip a move.

Scale shape per round: one scatter join (edges ⋈ labels, the same persisted
pre-partitioned edge side as pagerank), one (vertex, community) partial-agg
groupBy, one community-totals aggregation (community-count-sized, broadcast
back), and one per-vertex struct-max — no windows, no collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sparkgraph.graph import Graph
from sparkgraph.pregel import PregelResult, SuperstepLoop, truncate_lineage


def louvain_move(graph: Graph, rounds: int = 6) -> PregelResult:
    """Returns state ``(id, label)`` after ``rounds`` synchronous
    modularity-gain moves (labels initialized to own id; label = smallest
    gain-maximizing community each round). ``converged`` is True iff the
    last round moved nothing."""
    edges = graph.edges_sym  # persisted, pre-partitioned (multigraph: counts)
    deg = graph.degrees  # (id, deg) on the symmetrized multigraph
    two_m = edges.count()  # Σ deg = 2m (unit multiplicities)
    loop = SuperstepLoop("louvain_move", {"rounds": rounds, "two_m": two_m})

    labels = truncate_lineage(
        graph.vertices.select("id", F.col("id").alias("label"))
    )
    step = 0
    converged = False
    while step < rounds:
        loop.step_started()
        step += 1
        # community totals Σ_c = Σ deg(u) for u in c (community-sized)
        ctot = (
            labels.join(deg, "id")
            .groupBy("label")
            .agg(F.sum("deg").alias("tot"))
        )
        # k_{v,c}: edge multiplicity from v into each neighboring community
        kvc = (
            edges.join(
                labels.select(
                    F.col("id").alias("dst"), F.col("label").alias("c")
                ).hint("shuffle_hash"),
                "dst",
            )
            .groupBy(F.col("src").alias("id"), "c")
            .agg(F.count(F.lit(1)).alias("kvc"))
        )
        own = labels.select("id", F.col("label").alias("own"))
        # candidates = neighboring communities ∪ {own} (kvc = 0 for a
        # neighbor-less own community)
        cand = (
            kvc.join(own, "id", "full")
            .select(
                "id",
                F.coalesce("c", "own").alias("c"),
                F.coalesce("kvc", F.lit(0)).alias("kvc"),
            )
            .unionByName(
                own.select("id", F.col("own").alias("c"), F.lit(0).alias("kvc"))
            )
            .groupBy("id", "c")
            .agg(F.max("kvc").alias("kvc"))
        )
        scored = (
            cand.join(own, "id")
            .join(deg, "id")
            .join(ctot.select(F.col("label").alias("c"), "tot"), "c")
            .select(
                "id",
                "c",
                (
                    F.lit(two_m) * F.col("kvc")
                    - F.col("deg")
                    * (
                        F.col("tot")
                        - F.when(F.col("c") == F.col("own"), F.col("deg")).otherwise(
                            F.lit(0)
                        )
                    )
                ).alias("gain"),
            )
        )
        # argmax gain, smallest community on ties — integer struct max
        best = scored.groupBy("id").agg(
            F.max(F.struct(F.col("gain"), (-F.col("c")).alias("nc"))).alias("b")
        )
        new_labels = truncate_lineage(
            labels.select("id").join(
                best.select("id", (-F.col("b.nc")).alias("label")), "id", "left"
            ).select("id", F.coalesce("label", "id").alias("label"))
        )
        n_moved = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        loop.step_done(labels, step, changed=n_moved)
        if n_moved == 0:
            converged = True
            break
    return loop.finish(labels, step, converged, result=labels)
