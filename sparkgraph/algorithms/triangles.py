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


def oriented_edges(graph: Graph) -> DataFrame:
    """Simple edges oriented by (degree, id): (a → b) with rank(a) < rank(b)."""
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


def triangle_count(graph: Graph) -> int:
    o = oriented_edges(graph)
    e1 = o.select(F.col("a").alias("x"), F.col("b").alias("y"))
    e2 = o.select(F.col("a").alias("y"), F.col("b").alias("z"))
    wedges = e1.join(e2, "y").select("x", "z")
    closing = o.select(F.col("a").alias("x"), F.col("b").alias("z"))
    return wedges.join(closing, ["x", "z"]).count()


def triangle_count_df(graph: Graph) -> DataFrame:
    """Single-row DataFrame (triangles: long) — for the query/oracle surface."""
    spark = graph.spark
    return spark.createDataFrame([(triangle_count(graph),)], "triangles long")
