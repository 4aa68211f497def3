"""Salted two-phase aggregation ≡ plain groupBy on skewed data."""

import math

from pyspark.sql import functions as F

from sparkgraph.graph import Graph
from sparkgraph.io.synth import powerlaw_edges
from sparkgraph.skew import salted_agg, salted_message_sum, top_degree_hubs


def test_salted_agg_equals_plain_sum(spark):
    df = spark.range(10_000).select(
        (F.col("id") % 7).alias("k"), (F.col("id") * 0.5).alias("v")
    )
    plain = {r.k: r.v for r in df.groupBy("k").agg(F.sum("v").alias("v")).collect()}
    salted = {r.k: r.v for r in salted_agg(df, "k", "v", F.sum, salts=8).collect()}
    assert set(plain) == set(salted)
    assert all(math.isclose(plain[k], salted[k], rel_tol=1e-12) for k in plain)


def test_salted_agg_min(spark):
    df = spark.range(1_000).select((F.col("id") % 3).alias("k"), F.col("id").alias("v"))
    plain = {r.k: r.v for r in df.groupBy("k").agg(F.min("v").alias("v")).collect()}
    salted = {r.k: r.v for r in salted_agg(df, "k", "v", F.min, salts=4).collect()}
    assert plain == salted


def test_salted_message_sum_on_powerlaw(spark):
    g = Graph(powerlaw_edges(spark, 30_000, 1_000), num_partitions=4)
    msgs = g.edges_sym.select("dst", F.lit(1.0).alias("msg"))
    hubs = top_degree_hubs(g.degrees, threshold=100)
    assert hubs.count() > 0  # the power-law generator must actually make hubs
    plain = {
        r.id: r.msum
        for r in msgs.groupBy(F.col("dst").alias("id"))
        .agg(F.sum("msg").alias("msum"))
        .collect()
    }
    salted = {r.id: r.msum for r in salted_message_sum(msgs, hubs).collect()}
    assert set(plain) == set(salted)
    assert all(math.isclose(plain[k], salted[k], rel_tol=1e-12) for k in plain)
    g.unpersist()
