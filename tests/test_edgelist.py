"""Edge-list ingest semantics (operator A1) against the reference's own files."""

import os

from sparkgraph.io.edgelist import read_edgelist

from tests.fixtures import GRAPH_CHAIN, GRAPH_DOUBLED, GRAPH_MAIN, GRAPH_WORKER


def _pairs(df):
    return [(r.src, r.dst) for r in df.orderBy("src", "dst").collect()]


def test_comment_lines_skipped(spark, assets_dir):
    df = read_edgelist(spark, os.path.join(assets_dir, "graph_main.txt"))
    assert df.count() == 18  # two '# …' header lines skipped
    assert _pairs(df) == sorted(GRAPH_MAIN)


def test_no_comments_file(spark, assets_dir):
    df = read_edgelist(spark, os.path.join(assets_dir, "graph_chain.txt"))
    assert _pairs(df) == sorted(GRAPH_CHAIN)


def test_trailing_whitespace_tolerated(spark, assets_dir):
    # worker/test.txt line '12 16 ' carries a trailing space
    df = read_edgelist(spark, os.path.join(assets_dir, "graph_worker.txt"))
    assert _pairs(df) == sorted(GRAPH_WORKER)
    assert (12, 16) in _pairs(df)


def test_reciprocal_lines_kept_as_parallel_edges(spark, assets_dir):
    df = read_edgelist(spark, os.path.join(assets_dir, "graph_doubled.txt"))
    assert df.count() == 36  # no dedup of explicit reciprocal pairs
    assert sorted(_pairs(df)) == sorted(GRAPH_DOUBLED)


def test_weight_is_unit(spark, assets_dir):
    df = read_edgelist(spark, os.path.join(assets_dir, "graph_main.txt"))
    assert df.select("weight").distinct().collect()[0][0] == 1.0
