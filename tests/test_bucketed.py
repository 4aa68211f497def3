"""Bucketed edge tables: the at-rest layout must remove the shuffle — the
physical plan of a groupBy on the bucket key has NO Exchange operator."""

import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from sparkgraph.io.tables import TableIO


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bucketed_scan_needs_no_exchange_for_groupby(spark, tmp_path):
    tio = TableIO(spark, str(tmp_path))
    edges = spark.range(10_000).select(
        (F.col("id") % 500).alias("src"),
        ((F.col("id") * 7) % 500).alias("dst"),
        F.lit(1.0).alias("weight"),
    )
    tio.save_bucketed_edges(edges, "edges_b", buckets=8)
    try:
        b = tio.load_bucketed_edges("edges_b")
        agg = b.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
        plan = _plan(agg)
        assert "Exchange" not in plan, plan
        # and it computes the right thing
        got = {r.src: r.deg for r in agg.collect()}
        want = {r.src: r.deg for r in edges.groupBy("src").agg(
            F.count(F.lit(1)).alias("deg")).collect()}
        assert got == want

        # non-bucketed control: the same aggregation DOES exchange
        plain_plan = _plan(
            edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
        )
        assert "Exchange" in plain_plan
    finally:
        spark.sql("DROP TABLE IF EXISTS edges_b")
