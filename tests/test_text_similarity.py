"""Document/text operators and embedding similarity vs in-test oracles."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from sparkgraph.similarity import cosine_topk, lsh_bucketed_topk
from sparkgraph.text import (
    exact_dedup,
    language_id,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash,
    token_stats,
)

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog", "en"),
    (1, "the quick brown fox jumps over the lazy cat", "en"),
    (2, "der hund ist nicht der katze freund und feind", "de"),
    (3, "le chat est pas pour le chien et la souris", "fr"),
    (4, "the quick brown fox jumps over the lazy dog", "en"),  # dup of 0
    (5, "xyzzy plugh qwerty asdf zxcv", "und"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, t) for i, t, _ in DOCS], "doc_id long, text string"
    )


def test_exact_dedup_groups(docs):
    rows = exact_dedup(docs).collect()
    by_rep = {r.rep_id: r.dup_count for r in rows}
    assert by_rep[0] == 2  # docs 0 and 4 identical
    assert sum(by_rep.values()) == len(DOCS)
    assert len(rows) == 5


def test_token_stats(docs):
    got = {r.doc_id: r.n_tokens for r in token_stats(docs).collect()}
    assert got[0] == 9 and got[5] == 5


def test_language_id(docs):
    got = {r.doc_id: r.lang_pred for r in language_id(docs).collect()}
    want = {i: lg for i, _, lg in DOCS}
    assert got == want


def test_ngram_jaccard_finds_near_dups(docs):
    pairs = {
        (r.a, r.b): r.jaccard
        for r in ngram_jaccard_pairs(docs, threshold=0.4).collect()
    }
    assert pairs[(0, 4)] == 1.0  # exact dup
    assert (0, 1) in pairs  # one-word change, 7 shingles, 6 shared
    assert all(a < b for a, b in pairs)


def test_minhash_lsh_catches_exact_and_near_dups(docs):
    got = {(r.a, r.b): r.est_jaccard for r in minhash_lsh_pairs(docs, threshold=0.4).collect()}
    assert got[(0, 4)] == 1.0
    assert (0, 1) in got
    assert (2, 3) not in got


def test_simhash_similar_docs_have_close_hashes(docs):
    h = {r.id: r.simhash for r in simhash(docs).collect()}
    def ham(a, b):
        return bin(a ^ b).count("1")
    assert ham(h[0], h[4]) == 0  # identical
    assert ham(h[0], h[1]) < ham(h[0], h[5])  # near-dup closer than unrelated


@pytest.fixture(scope="module")
def vectors(spark):
    rng = np.random.RandomState(7)
    vecs = rng.randn(100, 16).astype("float32")
    vecs[3] = vecs[0] + 0.01 * rng.randn(16)  # a near neighbor of vec 0
    return (
        spark.createDataFrame(
            [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
            "vec_id long, embedding array<float>",
        ),
        vecs,
    )


def test_cosine_topk_matches_numpy(vectors):
    df, vecs = vectors
    q = vecs[0].astype("float64")
    got = [(r.vec_id, r.cosine) for r in cosine_topk(df, list(q), k=5).collect()]
    v = vecs.astype("float64")
    cos = v @ q / (np.linalg.norm(v, axis=1) * np.linalg.norm(q))
    want_ids = list(np.argsort(-np.round(cos, 6), kind="stable")[:5])
    assert [g[0] for g in got] == [int(i) for i in want_ids]
    assert got[0][0] == 0 and got[1][0] == 3
    for vid, c in got:
        assert math.isclose(c, round(float(cos[vid]), 6), abs_tol=2e-6)


def test_lsh_bucketed_topk_finds_the_near_neighbor(vectors):
    df, vecs = vectors
    got = lsh_bucketed_topk(df, [float(x) for x in vecs[0]], k=3, hamming=1).collect()
    ids = [r.vec_id for r in got]
    assert ids[0] == 0  # the query itself shares its own bucket
    assert 3 in ids  # the planted near neighbor lands within hamming-1


def test_embedding_neardup_lsh_equals_all_pairs(vectors):
    from sparkgraph.similarity import (
        embedding_near_dup_pairs,
        embedding_near_dup_pairs_lsh,
    )

    df, _ = vectors
    got = {
        (r.a, r.b): r.cosine
        for r in embedding_near_dup_pairs_lsh(df, threshold=0.5).collect()
    }
    want = {
        (r.a, r.b): r.cosine
        for r in embedding_near_dup_pairs(df, threshold=0.5).collect()
    }
    assert got == want
    assert (0, 3) in got and got[(0, 3)] > 0.99  # the planted near neighbor


def test_embedding_neardup_lsh_plan_has_no_cartesian(vectors):
    from sparkgraph.similarity import embedding_near_dup_pairs_lsh

    df, _ = vectors
    plan = embedding_near_dup_pairs_lsh(df, threshold=0.5)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_ivf_topk_matches_brute_force(vectors):
    from sparkgraph.similarity import ivf_topk, ivf_train

    df, vecs = vectors
    q = [float(x) for x in vecs[0]]
    cents = ivf_train(df, k=8, iters=2)
    assert len(cents) == 8 and all(len(c) == 16 for c in cents)
    brute = [(r.vec_id, r.cosine) for r in cosine_topk(df, q, k=5).collect()]
    exact_all = [
        (r.vec_id, r.cosine)
        for r in ivf_topk(df, q, cents, k=5, nprobe=8, allow_assign=True).collect()
    ]
    assert exact_all == brute  # nprobe = #lists degenerates to exact search
    probed = [
        (r.vec_id, r.cosine)
        for r in ivf_topk(df, q, cents, k=5, nprobe=3, allow_assign=True).collect()
    ]
    # the query's own vector and its planted near neighbor share a list with
    # the query — they must survive any nprobe >= 1
    ids = [p[0] for p in probed]
    assert ids[0] == 0 and 3 in ids


def test_ivf_train_is_deterministic(vectors):
    from sparkgraph.similarity import ivf_train

    df, _ = vectors
    assert ivf_train(df, k=8, iters=2) == ivf_train(df, k=8, iters=2)


def test_ivf_prebuilt_index_matches_on_the_fly(vectors, tmp_path):
    """ivf_topk over a prebuilt ivf_index must equal the assign-per-query
    path, and a partitionBy-written index must partition-PRUNE: the query
    plan reads only the nprobe cluster partitions, not the corpus."""
    from sparkgraph.similarity import ivf_index, ivf_topk, ivf_train

    df, vecs = vectors
    q = [float(x) for x in vecs[0]]
    cents = ivf_train(df, k=8, iters=2)
    fly = [(r.vec_id, r.cosine) for r in ivf_topk(df, q, cents, k=5, nprobe=3, allow_assign=True).collect()]

    idx_mem = ivf_index(df, cents)
    assert [(r.vec_id, r.cosine)
            for r in ivf_topk(idx_mem, q, cents, k=5, nprobe=3).collect()] == fly

    path = str(tmp_path / "ivf_index")
    idx_disk = ivf_index(df, cents, path=path)
    res = ivf_topk(idx_disk, q, cents, k=5, nprobe=3)
    assert [(r.vec_id, r.cosine) for r in res.collect()] == fly
    # partition pruning: the cluster IN (...) filter reaches the scan as a
    # partition filter, so only nprobe of the 8 list directories are read
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [cluster" in plan.replace("\n", " ") or (
        "cluster#" in plan and "PartitionFilters" in plan
    )
    n_clusters_read = {
        r.cluster for r in res.sparkSession.read.parquet(path).filter(
            "cluster is not null").select("cluster").distinct().collect()
    }
    assert len(n_clusters_read) == 8  # index covers all lists on disk


def test_repetition_stats_matches_python(spark):
    from collections import Counter
    import re

    from sparkgraph.text import repetition_stats

    docs = [
        (0, "the cat sat on the cat sat again"),
        (1, "a b a b a b a b"),
        (2, "all distinct words here now"),
        (3, "one"),            # fewer tokens than n -> all zeros
        (4, ""),               # empty
        (5, "x y x y? X Y!"),  # case/punct normalization
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_grams, r.n_distinct, r.top_count, r.dup_ratio)
        for r in repetition_stats(df, n=2).collect()
    }
    for did, text in docs:
        toks = re.findall(r"[a-z0-9]+", text.lower())
        grams = [" ".join(toks[i : i + 2]) for i in range(len(toks) - 1)]
        c = Counter(grams)
        total, dist = len(grams), len(c)
        top = max(c.values()) if c else 0
        ratio = round(1.0 - dist / max(total, 1), 6)
        assert got[did] == (total, dist, top, ratio), did
    assert got[1][3] > 0.7   # the degenerate doc is flagged
    assert got[2][3] == 0.0  # all-distinct doc is clean


def test_domain_stats_extracts_and_aggregates(spark):
    from sparkgraph.text import domain_stats

    docs = [
        (0, "see http://example.com/a and https://Example.COM/b plus http://other.org"),
        (1, "nothing here"),
        (2, "again https://example.com/x and http://sub.other.org/y"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r.domain: (r.n_docs, r.n_urls) for r in domain_stats(df).collect()
    }
    assert got == {
        "example.com": (2, 3),   # case-folded, counted per doc and per url
        "other.org": (1, 1),
        "sub.other.org": (1, 1),
    }


def test_unigram_logprob_matches_python(spark):
    import math
    import re
    from collections import Counter

    from sparkgraph.text import unigram_logprob

    docs = [
        (0, "the cat sat on the mat"),
        (1, "the the the the"),             # stereotypical -> low score
        (2, "zyzzyva qoph xylyl"),          # rare tokens -> high score
        (3, ""),                            # empty -> zeros
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_tokens, r.avg_neg_logp)
        for r in unigram_logprob(df).collect()
    }
    toks = {d: re.findall(r"[a-z0-9]+", t.lower()) for d, t in docs}
    corpus = Counter(tok for ts in toks.values() for tok in ts)
    n_total, n_vocab = sum(corpus.values()), len(corpus)
    for d, ts in toks.items():
        if not ts:
            assert got[d] == (0, 0.0)
            continue
        nlp = [-math.log((corpus[t] + 1) / (n_total + n_vocab)) for t in ts]
        assert got[d][0] == len(ts)
        assert math.isclose(got[d][1], round(sum(nlp) / len(nlp), 6), abs_tol=2e-6), d
    assert got[1][1] < got[0][1] < got[2][1]  # rare-token docs score higher


def test_ivf_topk_batch_matches_per_query(vectors):
    """Batch ANN over the prebuilt index must equal k independent
    single-query ivf_topk calls, per query."""
    from pyspark.sql import functions as F

    from sparkgraph.similarity import ivf_index, ivf_topk, ivf_topk_batch, ivf_train

    df, vecs = vectors
    cents = ivf_train(df, k=8, iters=2)
    index = ivf_index(df, cents)
    qids = [0, 7, 42]
    queries = df.filter(F.col("vec_id").isin(qids)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = {}
    for r in ivf_topk_batch(index, queries, cents, k=5, nprobe=3).collect():
        got.setdefault(r.query_id, []).append((r.rank, r.vec_id, r.cosine))
    for qid in qids:
        q = [float(x) for x in vecs[qid]]
        want = [
            (i + 1, r.vec_id, r.cosine)
            for i, r in enumerate(ivf_topk(index, q, cents, k=5, nprobe=3).collect())
        ]
        assert sorted(got[qid]) == want, qid


def test_feature_propagation_matches_python(spark):
    """Walk-count-weighted SGC smoothing vs a pure-python integer-exact
    replay, including featureless and non-graph vertices."""
    from collections import defaultdict

    from sparkgraph.features import feature_propagation
    from sparkgraph.graph import Graph

    pairs = [(1, 2), (2, 3), (3, 1), (3, 4), (10, 11)]
    feats = {1: [1.0, 0.0], 2: [0.0, 1.0], 3: [2.0, 2.0], 4: [4.0, -4.0],
             10: [8.0, 8.0], 99: [5.0, 5.0]}  # 99 not in graph; 11 featureless
    g = Graph(spark.createDataFrame(pairs, "src long, dst long"))
    fdf = spark.createDataFrame(
        [(k, v) for k, v in feats.items()], "vec_id long, embedding array<double>"
    )
    got = {
        (r.id, r.pos): r.val
        for r in feature_propagation(g, fdf, rounds=2).collect()
    }

    adj = defaultdict(set)
    for s, d in pairs:
        adj[s].add(d)
        adj[d].add(s)
    # integer-exact replay: quantize to 3-dp ints, propagate (num, w) sums
    x = {k: [(round(c * 1000), 1) for c in v] for k, v in feats.items()}
    for _ in range(2):
        new = {}
        for v in set(adj) | set(x):
            contrib = [x[u] for u in adj.get(v, ()) if u in x]
            if v in x:
                contrib.append(x[v])
            if contrib:
                new[v] = [
                    (sum(c[p][0] for c in contrib), sum(c[p][1] for c in contrib))
                    for p in range(2)
                ]
        x = new
    want = {
        (v, p): round(x[v][p][0] / (x[v][p][1] * 1000.0), 6)
        for v in x for p in range(2)
    }
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-9, k
    # vertex 99 has no graph edges: its features are fixed points
    assert got[(99, 0)] == 5.0 and got[(99, 1)] == 5.0
    # featureless vertex 11 acquired its featured neighbor's values
    assert got[(11, 0)] == 8.0 and got[(11, 1)] == 8.0
    # raw mode: exact integer state, and num/(w*scale) reproduces val
    raw = {
        (r.id, r.pos): (r.num, r.w)
        for r in feature_propagation(g, fdf, rounds=2, raw=True).collect()
    }
    assert set(raw) == set(got)
    for k, (num, w) in raw.items():
        assert got[k] == round(num / (w * 1000.0), 6), k
    g.unpersist()


def test_ivf_raw_corpus_raises_without_allow_assign(vectors):
    """The per-call full-corpus assignment footgun is now unfireable by
    accident: a cluster-less input raises unless allow_assign=True."""
    import pytest as _pytest

    from sparkgraph.similarity import ivf_topk, ivf_topk_batch, ivf_train

    df, vecs = vectors
    q = [float(x) for x in vecs[0]]
    cents = ivf_train(df, k=4, iters=1)
    with _pytest.raises(ValueError, match="allow_assign"):
        ivf_topk(df, q, cents, k=3, nprobe=2)
    queries = df.limit(2).selectExpr("vec_id AS query_id", "embedding")
    with _pytest.raises(ValueError, match="allow_assign"):
        ivf_topk_batch(df, queries, cents, k=3, nprobe=2)


def test_ivf_validate_index_catches_foreign_centroids(vectors):
    """validate=True cross-checks index cluster ids against the centroid
    count — an index built from a LARGER (stale) centroid set is rejected
    instead of silently probing the wrong lists."""
    import pytest as _pytest

    from sparkgraph.similarity import (
        ivf_index,
        ivf_topk,
        ivf_train,
        ivf_validate_index,
    )

    df, vecs = vectors
    q = [float(x) for x in vecs[0]]
    cents8 = ivf_train(df, k=8, iters=2)
    index8 = ivf_index(df, cents8)
    ivf_validate_index(index8, cents8)  # consistent: no raise
    res = ivf_topk(index8, q, cents8, k=3, nprobe=8, validate=True)
    assert len(res.collect()) == 3
    cents4 = cents8[:4]  # pretend a retrain shrank the list count
    with _pytest.raises(ValueError, match="different centroids"):
        ivf_topk(index8, q, cents4, k=3, nprobe=2, validate=True)


def test_jaccard_prefix_equals_bruteforce_join(docs, spark):
    """Prefix filtering is LOSSLESS: jaccard_prefix_pairs must return
    exactly ngram_jaccard_pairs' rows at every threshold — on the module
    fixture and on a larger randomized corpus with heavy shingle sharing."""
    import random

    from sparkgraph.text import jaccard_prefix_pairs

    for t in (0.3, 0.5, 0.8):
        brute = sorted(
            (r.a, r.b, r.jaccard)
            for r in ngram_jaccard_pairs(docs, threshold=t).collect()
        )
        pref = sorted(
            (r.a, r.b, r.jaccard)
            for r in jaccard_prefix_pairs(docs, threshold=t).collect()
        )
        assert pref == brute, t
    assert any(
        len(ngram_jaccard_pairs(docs, threshold=t).collect()) > 0
        for t in (0.3,)
    )  # the comparison is not vacuous

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(30)]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randrange(8, 25))))
        for i in range(40)
    ]
    big = spark.createDataFrame(rows, "doc_id long, text string")
    for t in (0.2, 0.5):
        brute = sorted(
            (r.a, r.b, r.jaccard)
            for r in ngram_jaccard_pairs(big, threshold=t).collect()
        )
        pref = sorted(
            (r.a, r.b, r.jaccard)
            for r in jaccard_prefix_pairs(big, threshold=t).collect()
        )
        assert pref == brute, t


def test_bm25_matches_python_oracle(docs):
    import math
    from collections import Counter

    from sparkgraph.text import BM25_B, BM25_K1, bm25_scores

    terms = ["quick", "dog", "katze"]
    got = {r.id: r.score for r in bm25_scores(docs, terms).collect()}

    toks = {i: [w.lower() for w in t.split()] for i, t, _ in DOCS}
    n = len(toks)
    avgdl = sum(len(v) for v in toks.values()) / n
    df = Counter(t for ws in toks.values() for t in set(ws) if t in terms)
    want = {}
    for i, ws in toks.items():
        tf = Counter(w for w in ws if w in terms)
        s = 0.0
        for t, f in tf.items():
            idf = math.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5))
            s += idf * f * (BM25_K1 + 1) / (
                f + BM25_K1 * (1 - BM25_B + BM25_B * len(ws) / avgdl)
            )
        want[i] = round(s, 6)
    assert set(got) == set(want)
    for i in want:
        assert math.isclose(got[i], want[i], abs_tol=1e-6), i
    # docs matching no query term score exactly 0.0 but are present
    assert got[3] == 0.0
    # ranking sanity: the duplicated quick-fox docs outrank the others
    assert got[0] == got[4] > got[2] > 0.0
