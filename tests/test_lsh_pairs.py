"""Scale-path near-dup operators: MinHash-LSH candidate+verify, SimHash
Hamming-band pairs (pigeonhole completeness), and bucket-size caps."""

import pytest
from pyspark.sql import functions as F

from sparkgraph.text import (
    minhash_lsh_candidates,
    minhash_lsh_neardup_pairs,
    ngram_jaccard_pairs,
    simhash,
    simhash_pairs,
)

DOCS = [
    (0, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    (1, "alpha beta gamma delta epsilon zeta eta theta iota lambda"),  # near 0
    (2, "one two three four five six seven eight nine ten eleven twelve"),
    (3, "one two three four five six seven eight nine ten eleven dozen"),  # near 2
    (4, "completely different content about spark shuffles and joins here"),
    (5, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),  # dup of 0
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_lsh_verify_equals_exact_sweep(docs):
    """LSH candidates + exact verify == the all-pairs quadratic sweep at a
    threshold above the S-curve knee."""
    got = {
        (r.a, r.b): r.jaccard
        for r in minhash_lsh_neardup_pairs(docs, threshold=0.5).collect()
    }
    want = {
        (r.a, r.b): r.jaccard
        for r in ngram_jaccard_pairs(docs, threshold=0.5).collect()
    }
    assert got == want
    assert (0, 5) in got and got[(0, 5)] == 1.0


def test_simhash_pairs_pigeonhole_complete(docs):
    """max_hamming < bands ⇒ banded result EXACTLY equals brute force."""
    sig = simhash(docs, bits=48, hash="md5")
    got = {
        (r.a, r.b): r.hamming
        for r in simhash_pairs(sig, bits=48, bands=8, max_hamming=7).collect()
    }
    # brute force over collected signatures
    sigs = {r.id: r.simhash for r in sig.collect()}
    ids = sorted(sigs)
    want = {
        (a, b): bin(sigs[a] ^ sigs[b]).count("1")
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if bin(sigs[a] ^ sigs[b]).count("1") <= 7
    }
    assert got == want
    assert got[(0, 5)] == 0  # identical docs, identical signature


def test_simhash_pairs_rejects_bad_params(docs):
    sig = simhash(docs, bits=48, hash="md5")
    with pytest.raises(ValueError):
        simhash_pairs(sig, bits=48, bands=8, max_hamming=8)  # no guarantee
    with pytest.raises(ValueError):
        simhash_pairs(sig, bits=48, bands=7)  # bands must divide bits


def test_simhash_portable_matches_duckdb_semantics(docs):
    """md5-mode bit extraction: recompute one signature in pure Python."""
    import hashlib

    sig = {r.id: r.simhash for r in simhash(docs, bits=48, hash="md5").collect()}
    toks = DOCS[4][1].split()
    n = len(toks)
    val = 0
    for j in range(48):
        s = sum(
            (int(hashlib.md5(t.encode()).hexdigest()[j // 4], 16) >> (j % 4)) & 1
            for t in toks
        )
        if 2 * s >= n:
            val |= 1 << j
    assert sig[4] == val


def test_bucket_cap_bounds_degenerate_corpus(spark):
    """A constant corpus collapses every band into one bucket: the cap must
    drop it (0 candidate pairs) instead of joining 200×200."""
    const = spark.createDataFrame(
        [(i, "same words repeated same words repeated same words") for i in range(200)],
        "doc_id long, text string",
    )
    capped = minhash_lsh_candidates(const, max_bucket_size=50)
    assert capped.count() == 0
    uncapped = minhash_lsh_candidates(const, max_bucket_size=100_000)
    assert uncapped.count() == 200 * 199 // 2

    sig = simhash(const, bits=48, hash="md5")
    assert simhash_pairs(sig, max_bucket_size=50).count() == 0
