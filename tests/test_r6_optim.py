"""Round-6 optimization internals: the emit-once LSH dedup's degenerate
fallback, the two exact-cosine attach shapes (join vs broadcast matrix),
and the session-cached CSR pack."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from sparkgraph.graph import Graph
from sparkgraph.text import simhash, simhash_pairs


@pytest.fixture(scope="module")
def vectors(spark):
    rng = np.random.default_rng(11)
    vecs = rng.normal(size=(40, 16)).astype("float32")
    vecs[3] = vecs[0] + rng.normal(scale=0.01, size=16).astype("float32")
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_simhash_pairs_oversized_fallback_drops_all(spark):
    """A constant corpus puts every doc in ONE bucket per band: with a small
    cap the fallback (anti-join + distinct) path must fire and drop every
    bucket — 0 pairs — instead of emitting the 200² join."""
    const = spark.createDataFrame(
        [(i, "same words repeated same words repeated") for i in range(200)],
        "doc_id long, text string",
    )
    sig = simhash(const)
    assert simhash_pairs(sig, max_bucket_size=50).count() == 0
    # with the cap lifted the emit-once path returns every pair exactly once
    n = simhash_pairs(sig, max_bucket_size=100_000).count()
    assert n == 200 * 199 // 2


def test_hyperplane_candidates_oversized_fallback(spark):
    """Identical vectors collapse every band bucket: small cap ⇒ fallback
    drops all; big cap ⇒ emit-once returns each pair exactly once."""
    from sparkgraph.similarity import hyperplane_banded_candidates

    rows = [(i, [1.0] * 16) for i in range(60)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    assert hyperplane_banded_candidates(df, 16, max_bucket_size=10).count() == 0
    n = hyperplane_banded_candidates(df, 16, max_bucket_size=10_000).count()
    assert n == 60 * 59 // 2  # exactly once per pair — the emit-once dedup


def test_emit_once_equals_distinct_semantics(vectors):
    """Emit-at-first-matching-band == distinct-over-all-matching-bands:
    recompute the candidate set brute-force from the signatures."""
    from sparkgraph.similarity import (
        _plane_components,
        _signatures_arrow,
        hyperplane_banded_candidates,
    )

    spark = vectors.sparkSession
    got = {
        (r.a, r.b)
        for r in hyperplane_banded_candidates(
            vectors, 16, seeds=(7, 1009)
        ).collect()
    }
    planes = [_plane_components(spark, 16, 16, s) for s in (7, 1009)]
    sigs = {
        r.vec_id: (r.sig0, r.sig1)
        for r in _signatures_arrow(vectors, planes, "vec_id", "embedding").collect()
    }
    r, mask = 2, 3
    want = set()
    for a in sigs:
        for b in sigs:
            if a >= b:
                continue
            for k in range(2):
                if any(
                    (sigs[a][k] >> (band * r)) & mask
                    == (sigs[b][k] >> (band * r)) & mask
                    for band in range(8)
                ):
                    want.add((a, b))
                    break
    assert got == want


def test_cosine_attach_shapes_agree_bitwise(vectors):
    """The join attach and the broadcast-matrix attach must produce
    bit-identical raw cosines (same float64 op sequence)."""
    from sparkgraph.similarity import _cosine_pairs_arrow, _cosine_pairs_bcast

    ids = [r.vec_id for r in vectors.select("vec_id").collect()]
    pairs = vectors.sparkSession.createDataFrame(
        [(a, b) for a in ids for b in ids if a < b], "a long, b long"
    )
    va = vectors.select(F.col("vec_id").alias("a"), F.col("embedding").alias("_va"))
    vb = vectors.select(F.col("vec_id").alias("b"), F.col("embedding").alias("_vb"))
    joined = _cosine_pairs_arrow(pairs.join(va, "a").join(vb, "b"), "a", "b", "_va", "_vb")
    bcast = _cosine_pairs_bcast(pairs, vectors, "vec_id", "embedding")
    assert joined.exceptAll(bcast).count() == 0
    assert bcast.exceptAll(joined).count() == 0


def test_packed_graph_session_cache(spark):
    """packed_graph returns the SAME pack for repeat calls on one Graph and
    releases it on Graph.unpersist()."""
    from sparkgraph.kernels.csr import packed_graph

    edges = spark.createDataFrame(
        [(i, (i + 1) % 50) for i in range(50)], "src long, dst long"
    )
    g = Graph(edges)
    p1 = packed_graph(g)
    p2 = packed_graph(g)
    assert p1 is p2
    g.unpersist()
    assert "_csr_pack_cache" not in g.__dict__
    p3 = packed_graph(g)  # rebuilt after release
    assert p3 is not p1
