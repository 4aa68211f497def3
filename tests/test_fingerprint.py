"""char_ngram_fingerprint: exact pure-Python oracle for the portable poly31
mode, structural properties for the xxhash64 production mode (same winnowing
logic, different gram hash)."""

import pytest

from sparkgraph.text import char_ngram_fingerprint

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick brown fox jumps over the lazy cat"),
    (2, "completely unrelated content with other words entirely"),
    (3, "the quick brown fox jumps over the lazy dog"),  # dup of 0
    (4, "tiny"),  # shorter than the gram size
]


def poly31(g: str, n: int = 5) -> int:
    codes = [ord(g[i]) if i < len(g) else 0 for i in range(n)]
    return sum(c * 31 ** (n - 1 - i) for i, c in enumerate(codes))


def fingerprint_oracle(text: str, n: int = 5, k: int = 8) -> list[int]:
    grams = [text[i : i + n] for i in range(max(len(text) - n, 0) + 1)]
    return sorted({poly31(g, n) for g in grams})[:k]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_poly31_mode_matches_python_oracle(docs):
    got = {
        r.id: list(r.fingerprint)
        for r in char_ngram_fingerprint(docs, hash="poly31").collect()
    }
    for i, t in DOCS:
        assert got[i] == fingerprint_oracle(t), f"doc {i}"


def test_xxhash64_mode_winnowing_properties(docs):
    got = {
        r.id: list(r.fingerprint)
        for r in char_ngram_fingerprint(docs, hash="xxhash64").collect()
    }
    assert got[0] == got[3]  # identical content, identical fingerprint
    assert all(fp == sorted(set(fp)) for fp in got.values())  # ascending, distinct
    assert all(len(fp) <= 8 for fp in got.values())
    overlap_near = len(set(got[0]) & set(got[1]))
    overlap_far = len(set(got[0]) & set(got[2]))
    assert overlap_near > overlap_far  # near-dup shares more min-hashes
    assert len(got[4]) == 1  # sub-gram-size doc: one (whole-text) gram


def test_unknown_hash_rejected(docs):
    with pytest.raises(ValueError):
        char_ngram_fingerprint(docs, hash="md5")
