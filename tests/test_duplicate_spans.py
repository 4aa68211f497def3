"""Exact-substring duplicate spans vs a pure-python replay."""

import re
from collections import Counter, defaultdict

import pytest

from sparkgraph.text import duplicate_spans


def _spans_oracle(docs, n, min_count):
    """docs: {id: text} → {(id, start, end, n_grams)} (1-based inclusive)."""
    toks = {i: re.findall(r"[a-z0-9]+", t.lower()) for i, t in docs.items()}
    grams = defaultdict(list)  # id -> [(start, gram)]
    counts = Counter()
    for i, tk in toks.items():
        for p in range(len(tk) - n + 1):
            g = " ".join(tk[p : p + n])
            grams[i].append((p + 1, g))
            counts[g] += 1
    out = set()
    for i, lst in grams.items():
        hits = sorted(
            (s, s + n - 1) for s, g in lst if counts[g] >= min_count
        )
        cur = None
        for s, e in hits:
            if cur is None or s > cur[1] + 1:
                if cur is not None:
                    out.add((i, cur[0], cur[1], cur[2]))
                cur = [s, e, 1]
            else:
                cur[1] = max(cur[1], e)
                cur[2] += 1
        if cur is not None:
            out.add((i, cur[0], cur[1], cur[2]))
    return out


def _run(spark, docs, n=3, min_count=2):
    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    rows = duplicate_spans(df, n=n, min_count=min_count).collect()
    return {(r.doc_id, r.span_start, r.span_end, r.n_dup_grams) for r in rows}


def test_cross_doc_boilerplate_span(spark):
    docs = {
        1: "alpha beta gamma delta SHARED ONE TWO THREE tail x",
        2: "other words here shared one two three more stuff",
        3: "totally unrelated text with no duplication at all",
    }
    got = _run(spark, docs, n=3)
    assert got == _spans_oracle(docs, 3, 2)
    # the shared 4-token run appears as one merged span in both docs
    assert {(d, e - s + 1) for d, s, e, _ in got} == {(1, 4), (2, 4)}


def test_within_doc_repeat_counts(spark):
    docs = {7: "spam spam spam spam spam end of message", 8: "clean document"}
    got = _run(spark, docs, n=2)
    assert got == _spans_oracle(docs, 2, 2)
    assert any(d == 7 for d, *_ in got)  # self-repeats are duplicates too


def test_random_docs_match_oracle(spark):
    import random

    rnd = random.Random(11)
    vocab = [f"w{k}" for k in range(30)]
    docs = {
        i: " ".join(rnd.choice(vocab) for _ in range(rnd.randrange(5, 60)))
        for i in range(40)
    }
    for n, mc in ((2, 2), (3, 2), (3, 4)):
        assert _run(spark, docs, n=n, min_count=mc) == _spans_oracle(docs, n, mc), (n, mc)


def test_errors(spark):
    df = None
    with pytest.raises(ValueError):
        duplicate_spans(df, n=1)
    with pytest.raises(ValueError):
        duplicate_spans(df, min_count=1)
