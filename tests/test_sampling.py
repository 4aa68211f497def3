"""Deterministic sampling operators vs python replays."""

import hashlib

import pytest

from sparkgraph.sampling import hash_sample, stratified_sample, top_k_per_group


def _docs(spark, n=400):
    rows = [
        (i, ["web", "books", "code"][i % 3], float((i * 37) % 100))
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "doc_id long, source string, score double")


def _md5_u(key, salt=0):
    h = hashlib.md5(f"{key}#{salt}".encode()).hexdigest()[:8]
    return int(h, 16) / 2**32


def test_md5_mode_matches_python_replay(spark):
    df = _docs(spark)
    got = {r.doc_id for r in hash_sample(df, "doc_id", 0.3, hash="md5").collect()}
    want = {i for i in range(400) if _md5_u(i) < 0.3}
    assert got == want


def test_deterministic_and_nested(spark):
    df = _docs(spark)
    s10 = {r.doc_id for r in hash_sample(df, "doc_id", 0.1).collect()}
    s10b = {r.doc_id for r in hash_sample(df.repartition(7), "doc_id", 0.1).collect()}
    s30 = {r.doc_id for r in hash_sample(df, "doc_id", 0.3).collect()}
    assert s10 == s10b  # partitioning-independent
    assert s10 <= s30  # nested at the same salt
    # a different salt is an independent draw, not a subset chain
    s10c = {r.doc_id for r in hash_sample(df, "doc_id", 0.1, salt=1).collect()}
    assert s10c != s10


def test_rate_roughly_honored(spark):
    df = _docs(spark, n=2000)
    n = hash_sample(df, "doc_id", 0.25).count()
    assert 400 <= n <= 600  # 25% of 2000 = 500 ± noise


def test_stratified_rates(spark):
    df = _docs(spark)
    out = stratified_sample(
        df, "doc_id", "source", {"web": 0.2, "books": 1.0}
    )
    rows = out.collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r.source, set()).add(r.doc_id)
    assert "code" not in by_src  # default_fraction=0 drops unlisted strata
    assert len(by_src["books"]) == 133  # rate 1.0 keeps every books row
    # the web stratum at 0.2 is exactly the global 0.2 sample ∩ web
    web_all = {i for i in range(400) if i % 3 == 0}
    global_02 = {r.doc_id for r in hash_sample(df, "doc_id", 0.2).collect()}
    assert by_src["web"] == web_all & global_02


def test_top_k_per_group(spark):
    df = _docs(spark, n=60)
    out = top_k_per_group(df, "source", "score", k=5, tie_col="doc_id")
    rows = [(r.source, r.score, r.doc_id) for r in out.collect()]
    assert len(rows) == 15
    import collections

    data = collections.defaultdict(list)
    for i in range(60):
        data[["web", "books", "code"][i % 3]].append((float((i * 37) % 100), i))
    for src, vals in data.items():
        want = sorted(vals, key=lambda t: (-t[0], t[1]))[:5]
        got = sorted(
            [(s, d) for (g, s, d) in rows if g == src], key=lambda t: (-t[0], t[1])
        )
        assert got == want, src


def test_errors(spark):
    df = _docs(spark, n=10)
    with pytest.raises(ValueError):
        hash_sample(df, "doc_id", 1.5)
    with pytest.raises(ValueError):
        stratified_sample(df, "doc_id", "source", {"web": -0.1})
    with pytest.raises(ValueError):
        top_k_per_group(df, "source", "score", k=0)
    with pytest.raises(ValueError):
        hash_sample(df, "doc_id", 0.5, hash="sha1")
