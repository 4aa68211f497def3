"""Round-5 second-wave operators: HLL sketch, containment, bigram LM,
community stats, batch PPR, k-means assignment."""

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from sparkgraph.graph import Graph


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


# ---------------------------------------------------------------------------
# HLL


def test_hll_registers_mergeable_and_estimate(spark):
    from sparkgraph.sketches import hll_distinct, hll_estimate, hll_registers

    df = spark.range(0, 5000).select((F.col("id") % 1000).alias("v"))
    est = hll_distinct(df, "v", b=9).collect()[0]["n_distinct_hll"]
    assert abs(est - 1000) / 1000 < 0.15  # m=512 → ~4.6% stderr; 15% is lax

    # merge = union registers + re-max; must equal the single-shot registers
    left = hll_registers(df.filter(F.col("v") < 700), "v", b=9)
    right = hll_registers(df.filter(F.col("v") >= 300), "v", b=9)
    merged = (
        left.unionByName(right)
        .groupBy("bucket")
        .agg(F.max("rho").alias("rho"))
    )
    whole = hll_registers(df, "v", b=9)
    assert (
        merged.exceptAll(whole).count() == 0
        and whole.exceptAll(merged).count() == 0
    )
    est_m = hll_estimate(merged, b=9).collect()[0]["n_distinct_hll"]
    assert est_m == est


def test_hll_matches_duckdb_twin(spark, tmp_path):
    from sparkgraph.sketches import hll_distinct, hll_sql

    df = spark.range(0, 2000).select(
        (F.col("id") % 7).cast("string").alias("g"), (F.col("id") % 400).alias("v")
    )
    p = str(tmp_path / "t.parquet")
    df.write.parquet(p)
    got = {
        (r["g"], r["n_distinct_hll"])
        for r in hll_distinct(df, "v", ["g"], b=8).collect()
    }
    con = duckdb.connect()
    con.execute(f"CREATE VIEW t AS SELECT * FROM read_parquet('{p}/*.parquet')")
    want = set(
        con.execute(hll_sql("t", "v", ["g"], b=8)).fetchall()
    )
    assert got == want


def test_hll_b_bounds(spark):
    from sparkgraph.sketches import hll_registers

    with pytest.raises(ValueError):
        hll_registers(spark.range(1), "id", b=3)


# ---------------------------------------------------------------------------
# containment


def test_containment_subset_doc(spark):
    from sparkgraph.text import containment_pairs

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog near the river bank"),
            (2, "quick brown fox jumps over"),  # wholly inside doc 1
            (3, "completely different words here entirely"),
        ],
        "doc_id long, text string",
    )
    rows = {
        (r["a"], r["b"]): r["containment"]
        for r in containment_pairs(docs, n=3, threshold=0.5).collect()
    }
    # every 3-shingle of doc 2 appears in doc 1 → containment(2→1) = 1.0
    assert rows[(2, 1)] == 1.0
    # doc 1 is much longer: containment(1→2) < 0.5 → filtered out
    assert (1, 2) not in rows
    assert not any(3 in k for k in rows)


# ---------------------------------------------------------------------------
# bigram LM


def test_bigram_logprob_hand_computed(spark):
    from sparkgraph.text import bigram_logprob

    # corpus: "a b a b", "a b", "x"; vocab = {a, b, x} → V = 3
    # bigrams: (a,b)x3, (b,a)x1 ; c1: a→3, b→1
    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b"), (3, "x")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in bigram_logprob(docs).collect()}
    p_ab = (3 + 1) / (3 + 3)  # c2+1 / (c1 + V), V = 3 (a, b, x)
    p_ba = (1 + 1) / (1 + 3)
    exp1 = round(-(2 * math.log(p_ab) + math.log(p_ba)) / 3, 6)
    assert out[1]["n_bigrams"] == 3
    assert out[1]["avg_neg_logp"] == pytest.approx(exp1, abs=2e-6)
    assert out[2]["n_bigrams"] == 1
    assert out[2]["avg_neg_logp"] == pytest.approx(round(-math.log(p_ab), 6), abs=2e-6)
    # single-token doc: no bigrams
    assert out[3]["n_bigrams"] == 0 and out[3]["avg_neg_logp"] == 0.0


# ---------------------------------------------------------------------------
# community stats


def test_community_stats_two_cliques_with_bridge(spark):
    from sparkgraph.algorithms.structure import community_stats

    # triangle {1,2,3} + triangle {4,5,6} + bridge 3-4
    g = Graph(
        _edges(spark, [(1, 2), (1, 3), (2, 3), (4, 5), (4, 6), (5, 6), (3, 4)])
    )
    labels = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 10), (4, 20), (5, 20), (6, 20)], "id long, label long"
    )
    rows = {r["label"]: r for r in community_stats(g, labels).collect()}
    # community 10: volume = 2*3 intra + 1 bridge endpoint = 7; cut = 1
    assert rows[10]["n_vertices"] == 3
    assert rows[10]["volume"] == 7
    assert rows[10]["cut_edges"] == 1
    assert rows[10]["internal_edges"] == 6
    assert rows[10]["conductance"] == round(1 / 7, 6)
    assert rows[20]["conductance"] == round(1 / 7, 6)


def test_community_stats_single_community_is_zero(spark):
    from sparkgraph.algorithms.structure import community_stats

    g = Graph(_edges(spark, [(1, 2), (2, 3)]))
    labels = spark.createDataFrame([(1, 0), (2, 0), (3, 0)], "id long, label long")
    r = community_stats(g, labels).collect()[0]
    assert r["cut_edges"] == 0 and r["conductance"] == 0.0


# ---------------------------------------------------------------------------
# batch PPR


def test_ppr_batch_matches_per_seed(spark):
    from sparkgraph.algorithms.pagerank import pagerank, ppr_batch

    from .fixtures import GRAPH_MAIN

    g = Graph(_edges(spark, GRAPH_MAIN))
    batch = ppr_batch(g, [1, 3], iterations=8)
    for seed in (1, 3):
        single = {
            r["id"]: r["value"]
            for r in pagerank(
                g, mode="reference", iterations=8, reset_to=seed
            ).state.collect()
        }
        got = {
            r["id"]: r["value"]
            for r in batch.filter(F.col("seed") == seed).collect()
        }
        assert set(got) == set(single)
        for i, v in single.items():
            assert got[i] == pytest.approx(v, abs=1e-12)


def test_ppr_batch_empty_seeds_raises(spark):
    from sparkgraph.algorithms.pagerank import ppr_batch

    from .fixtures import GRAPH_CHAIN

    with pytest.raises(ValueError):
        ppr_batch(Graph(_edges(spark, GRAPH_CHAIN)), [])


# ---------------------------------------------------------------------------
# k-means assignment (ivf_train is covered in test_text_similarity; here:
# separated blobs land in distinct clusters and assignment is deterministic)


def test_kmeans_two_blobs(spark):
    from sparkgraph.similarity import ivf_assign, ivf_train

    rows = [(i, [10.0 + 0.01 * i, 0.0]) for i in range(6)] + [
        (100 + i, [0.0, 5.0 + 0.01 * i]) for i in range(6)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = ivf_train(df, k=2, iters=2)
    got = {r["vec_id"]: r["cluster"] for r in ivf_assign(df, cents).collect()}
    xs = {got[i] for i in range(6)}
    ys = {got[100 + i] for i in range(6)}
    assert len(xs) == 1 and len(ys) == 1 and xs != ys
