"""Exact triangle counting via degree-ordered orientation + 2-path join.

The reference has no triangle program (SURVEY.md §2C). Definition: number of
distinct vertex triples {a,b,c} mutually adjacent in the SIMPLE undirected
graph — the loader's parallel edges and self-loops are deduplicated first
(documented dedup step, FIXTURES.md §4).

Algorithm (standard for skewed/web-scale graphs — avoids the hub blow-up of
a naive 2-path join, SURVEY.md §7 risk (iii)): orient every undirected edge
from the endpoint with smaller (degree, id) to the larger. The oriented graph
is acyclic with max out-degree O(√E), so the wedge join is bounded even on
power-law graphs. Each triangle is counted exactly once, at its lowest-degree
apex:

    triangles = |{(a,b,c) : a→b, b→c, a→c oriented edges}|
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sparkgraph.graph import Graph


def oriented_edges(graph: Graph, simple: DataFrame | None = None) -> DataFrame:
    """Simple edges oriented by (degree, id): (a → b) with rank(a) < rank(b).

    ``simple``: optional precomputed (ideally persisted) simple_undirected
    view, so callers that already materialized it don't recompute the
    dedup+degree pipeline."""
    if simple is None:
        simple = graph.simple_undirected()  # (u < v, deduped, no loops)
    deg = (
        simple.select(F.col("u").alias("id"))
        .unionByName(simple.select(F.col("v").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("sdeg"))
    )
    du = deg.select(F.col("id").alias("u"), F.col("sdeg").alias("du"))
    dv = deg.select(F.col("id").alias("v"), F.col("sdeg").alias("dv"))
    e = simple.join(du, "u").join(dv, "v")
    lower_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    return e.select(
        F.when(lower_first, F.col("u")).otherwise(F.col("v")).alias("a"),
        F.when(lower_first, F.col("v")).otherwise(F.col("u")).alias("b"),
    )


def triangle_count(graph: Graph, strategy: str = "auto") -> int:
    """Physical strategies (same exact count):

    * 'bitset'    — broadcast the oriented adjacency as a packed bit matrix
      and popcount row-AND per edge in a vectorized Arrow kernel. The matrix
      is built DISTRIBUTIVELY: per-partition partial matrices on executors,
      tree-OR merged, so the driver never sees an edge row. The right plan
      for DENSE vertex sets (n ≤ ~16k: matrix ≤ 32 MB); turns the 10⁸
      wedge explosion of a near-complete graph into a few hundred MB of
      bitwise ops.
    * 'intersect' — per-edge sorted-adjacency intersection; never shuffles
      the wedge set, only E rows carrying O(√E) neighbor arrays. The scale
      path for sparse/skewed graphs with many vertices.
    * 'wedge'     — classic 2-path join + closing-edge semi-join.
    * 'auto'      — bitset when the vertex count fits the broadcast matrix,
      else intersect.
    """
    # One persisted simple view feeds the auto-strategy vertex count, the
    # degree computation AND the orientation — previously each derived it
    # from scratch (3× the dedup pipeline per call). Measured: 5.6s → 3.6s
    # on the supplier graph (guide §1.2: don't compute things twice).
    simple = graph.simple_undirected().persist()
    try:
        if strategy == "auto":
            n = simple.select(F.explode(F.array("u", "v"))).distinct().count()
            strategy = "bitset" if n <= 16384 else "intersect"
        if strategy == "bitset":
            return _triangle_count_bitset(graph, simple)
        if strategy == "wedge":
            o = oriented_edges(graph, simple).persist()
            try:
                e1 = o.select(F.col("a").alias("x"), F.col("b").alias("y"))
                e2 = o.select(F.col("a").alias("y"), F.col("b").alias("z"))
                wedges = e1.join(e2, "y").select("x", "z")
                closing = o.select(F.col("a").alias("x"), F.col("b").alias("z"))
                return wedges.join(closing, ["x", "z"]).count()
            finally:
                o.unpersist()
        if strategy != "intersect":
            raise ValueError(f"unknown strategy {strategy!r}")
        o = oriented_edges(graph, simple).persist()
        try:
            # oriented out-neighbor lists: bounded by O(sqrt E) per vertex
            adj = o.groupBy("a").agg(F.collect_list("b").alias("nbrs"))
            ea = adj.select(F.col("a").alias("_a"), F.col("nbrs").alias("na"))
            eb = adj.select(F.col("a").alias("_b"), F.col("nbrs").alias("nb"))
            per_edge = (
                o.join(ea, o.a == ea._a)
                .join(eb, o.b == eb._b)
                .select(F.size(F.array_intersect("na", "nb")).alias("t"))
            )
            row = per_edge.agg(F.sum("t").alias("triangles")).collect()[0]
            return int(row.triangles or 0)
        finally:
            o.unpersist()
    finally:
        simple.unpersist()


def _triangle_count_bitset(graph: Graph, simple: DataFrame | None = None) -> int:
    import numpy as np
    import pyarrow as pa

    o = oriented_edges(graph, simple).persist()
    # vertex universe: n ≤ 16k ids — the only per-row data the driver sees
    ids = np.sort(
        np.array(
            [
                r[0]
                for r in o.select(F.explode(F.array("a", "b")).alias("id"))
                .distinct()
                .collect()
            ],
            dtype=np.int64,
        )
    )
    n = len(ids)
    width = (n + 7) // 8

    def partial_matrix(batches):
        # per-partition packed oriented-adjacency bits (n ≤ 16k ⇒ ≤ 32 MB);
        # edges never leave the executors — only OR-merged matrices do
        m = np.zeros((n, width), dtype=np.uint8)
        for b in batches:
            ai = np.searchsorted(ids, b.column("a").to_numpy(zero_copy_only=False))
            bi = np.searchsorted(ids, b.column("b").to_numpy(zero_copy_only=False))
            np.bitwise_or.at(m, (ai, bi >> 3), (1 << (bi & 7)).astype(np.uint8))
        yield pa.RecordBatch.from_arrays(
            [pa.array([m.tobytes()], type=pa.large_binary())], names=["m"]
        )

    def or_merge(batches):
        acc = np.zeros(n * width, dtype=np.uint8)
        for b in batches:
            for blob in b.column("m"):
                np.bitwise_or(
                    acc, np.frombuffer(blob.as_py(), dtype=np.uint8), out=acc
                )
        yield pa.RecordBatch.from_arrays(
            [pa.array([acc.tobytes()], type=pa.large_binary())], names=["m"]
        )

    # build distributively (one partial matrix per partition, in parallel),
    # OR-merge executor-side; the driver receives exactly one packed matrix
    blobs = o.mapInArrow(partial_matrix, "m binary")
    merged = blobs.repartition(1).mapInArrow(or_merge, "m binary").collect()
    mat = np.frombuffer(merged[0].m, dtype=np.uint8).reshape(n, width)
    bc = graph.spark.sparkContext.broadcast((ids, mat))
    popcnt = np.unpackbits(np.arange(256, dtype=np.uint8)[:, None], axis=1).sum(1)

    def kernel(batches):
        ids_l, m = bc.value
        for b in batches:
            a_idx = np.searchsorted(ids_l, b.column("a").to_numpy(zero_copy_only=False))
            b_idx = np.searchsorted(ids_l, b.column("b").to_numpy(zero_copy_only=False))
            inter = np.bitwise_and(m[a_idx], m[b_idx])
            t = int(popcnt[inter].sum())
            yield pa.RecordBatch.from_arrays([pa.array([t], type=pa.int64())], names=["t"])

    total = (
        o.mapInArrow(kernel, "t long").agg(F.sum("t").alias("triangles")).collect()[0]
    )
    bc.destroy()
    o.unpersist()
    return int(total.triangles or 0)


def triangle_count_df(graph: Graph) -> DataFrame:
    """Single-row DataFrame (triangles: long) — for the query/oracle surface."""
    spark = graph.spark
    return spark.createDataFrame([(triangle_count(graph),)], "triangles long")


def triangle_list(graph: Graph) -> DataFrame:
    """Enumerate the triangles themselves — ``(x, y, z)`` with x < y < z, one
    row per triangle. The motif-mining twin of ``triangle_count`` (listings
    feed clique search, support counting, subgraph features); same
    degree-ordered orientation as the wedge strategy, so wedge volume is
    O(E^1.5)-bounded and hub wedges never explode."""
    o = oriented_edges(graph)
    ab = o.select(F.col("a").alias("ta"), F.col("b").alias("tb"))
    bc = o.select(F.col("a").alias("tb"), F.col("b").alias("tc"))
    ac = o.select(F.col("a").alias("ta"), F.col("b").alias("tc"))
    tri = ab.join(bc, "tb").join(ac, ["ta", "tc"])
    srt = F.array_sort(F.array("ta", "tb", "tc"))
    return tri.select(
        srt[0].alias("x"), srt[1].alias("y"), srt[2].alias("z")
    )


def four_clique_count(graph: Graph) -> DataFrame:
    """Count K4 subgraphs: one row ``(n_four_cliques,)``. Extends each
    enumerated triangle (x<y<z) by a fourth vertex w > z adjacent to all
    three — every K4 is counted exactly once in its sorted orientation.
    Join volume is Σ_triangles |N(x) above z|, bounded by the same
    degree-ordered discipline as the triangle pass (no hub wedge blow-up);
    the two closing checks are canonical-pair semi-joins."""
    tri = triangle_list(graph)
    se = graph.simple_undirected()  # (u < v)
    cand = tri.join(
        se.select(F.col("u").alias("x"), F.col("v").alias("w")), "x"
    ).filter(F.col("w") > F.col("z"))
    cand = cand.join(
        se.select(F.col("u").alias("y"), F.col("v").alias("w")), ["y", "w"], "left_semi"
    )
    cand = cand.join(
        se.select(F.col("u").alias("z"), F.col("v").alias("w")), ["z", "w"], "left_semi"
    )
    return cand.agg(F.count(F.lit(1)).alias("n_four_cliques"))
