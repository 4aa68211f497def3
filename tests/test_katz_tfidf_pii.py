"""Katz centrality, TF-IDF top terms, and PII scrub vs pure-Python oracles."""

from __future__ import annotations

import hashlib
import math
import re
from collections import Counter, defaultdict

from sparkgraph.algorithms import katz_centrality
from sparkgraph.graph import Graph
from sparkgraph.io.edgelist import edges_from_pairs
from sparkgraph.text import PII_PATTERNS, pii_scrub, tfidf_top_terms

from tests.fixtures import GRAPH_MAIN
from tests.oracles import symmetrize


def test_katz_matches_python_oracle(spark):
    alpha, beta, iters = 0.05, 1.0, 8
    g = Graph(edges_from_pairs(spark, GRAPH_MAIN), num_partitions=4)
    got = {
        r.id: r.value for r in katz_centrality(g, alpha, beta, iters).state.collect()
    }
    # python replay on the symmetrized MULTIgraph (duplicates count)
    out_nbrs = defaultdict(list)
    for s, d in symmetrize(GRAPH_MAIN):
        out_nbrs[s].append(d)
    verts = sorted(out_nbrs)
    x = {v: 0.0 for v in verts}
    for _ in range(iters):
        nxt = {}
        for v in verts:
            nxt[v] = beta + alpha * 0.0
        sums = defaultdict(float)
        for s, ds in out_nbrs.items():
            for d in ds:
                sums[d] += x[s]
        for v in verts:
            nxt[v] = beta + alpha * sums[v]
        x = nxt
    assert set(got) == set(x)
    for v in x:
        assert abs(got[v] - x[v]) < 1e-9, v


def test_katz_truncated_is_walk_series_prefix(spark):
    # on a single edge a-b, x_T(a) = sum_{l=0..T-1} alpha^l * beta
    alpha, beta = 0.5, 1.0
    g = Graph(edges_from_pairs(spark, [(1, 2)]), num_partitions=2)
    for iters in (1, 2, 3, 4):
        got = {r.id: r.value for r in katz_centrality(g, alpha, beta, iters).state.collect()}
        want = sum(beta * alpha**l for l in range(iters))
        assert abs(got[1] - want) < 1e-12 and abs(got[2] - want) < 1e-12


DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick brown cat naps all day the cat"),
    (3, "graphs of graphs and the analysis of graphs"),
    (4, "completely unrelated words here zebra xylophone"),
]


def test_tfidf_matches_python_oracle(spark):
    k = 3
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = [
        (r.doc_id, r.term, r.tfidf, r.rank)
        for r in tfidf_top_terms(df, k=k).collect()
    ]
    tf = {
        i: Counter(re.findall(r"[a-z0-9]+", t.lower())) for i, t in DOCS
    }
    dfreq = Counter(term for c in tf.values() for term in c)
    n = len(DOCS)
    want = []
    for i in tf:
        scored = sorted(
            (
                (term, round(cnt * (math.log((n + 1) / (dfreq[term] + 1)) + 1), 6))
                for term, cnt in tf[i].items()
            ),
            key=lambda t: (-t[1], t[0]),
        )[:k]
        want += [(i, term, s, r + 1) for r, (term, s) in enumerate(scored)]
    assert sorted(got) == sorted(want)


def test_pii_scrub_counts_and_redaction_sha(spark):
    rows = [
        (1, "mail me at alice.smith+x@example.co.uk or call 555-123-4567"),
        (2, "servers 10.0.0.1 and 192.168.1.255 are fine, 999.1.2.3 too"),
        (3, "no pii whatsoever in this one"),
        (4, "bob@corp.io bob@corp.io 1.2.3.4 555 867 5309"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_email, r.n_ipv4, r.n_phone, r.clean_sha)
        for r in pii_scrub(df).collect()
    }
    for i, text in rows:
        n_email = len(re.findall(PII_PATTERNS["email"], text))
        n_ipv4 = len(re.findall(PII_PATTERNS["ipv4"], text))
        n_phone = len(re.findall(PII_PATTERNS["phone"], text))
        clean = text
        for name, pat in PII_PATTERNS.items():
            clean = re.sub(pat, f"<{name.upper()}>", clean)
        sha = hashlib.sha256(clean.encode()).hexdigest()
        assert got[i] == (n_email, n_ipv4, n_phone, sha), i
    # the redaction actually fired where expected
    assert got[1][0] == 1 and got[1][2] == 1
    assert got[2][1] == 3  # 999.1.2.3 still matches the shape pattern
    assert got[4] == (2, 1, 1, got[4][3])


def test_dedup_clusters_end_to_end(spark):
    """Planted near-dup chains collapse to min-id clusters; singletons keep
    themselves; filter(is_rep) is the deduplicated corpus."""
    from sparkgraph.text import dedup_clusters

    base = "the quick brown fox jumps over the lazy dog again and again ok"
    docs = [
        (10, base),
        (11, base + " extra"),            # near-dup of 10
        (12, base + " extra tail"),       # near-dup of 11 (chain)
        (20, "completely different words about graphs and engines here"),
        (21, "completely different words about graphs and engines here now"),
        (30, "a singleton document with its very own unique content plus"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r.doc_id: (r.cluster_id, r.is_rep)
        for r in dedup_clusters(df, threshold=0.5).collect()
    }
    assert len(got) == len(docs)
    # chains merged transitively to the min id
    assert got[10] == (10, True) and got[11] == (10, False) and got[12] == (10, False)
    assert got[20] == (20, True) and got[21] == (20, False)
    assert got[30] == (30, True)
    # no near-dup pairs at all -> everyone is their own rep
    solo = spark.createDataFrame(docs[3:], "doc_id long, text string").filter("doc_id >= 30")
    got2 = {r.doc_id: r.is_rep for r in dedup_clusters(solo).collect()}
    assert got2 == {30: True}


def test_contamination_scores_vs_python_oracle(spark):
    from sparkgraph.text import contamination_scores

    train = [
        (1, "alpha beta gamma delta epsilon zeta"),
        (2, "alpha beta gamma completely different tail here"),
        (3, "nothing shared with anything else at all friends"),
    ]
    probe = [(100, "alpha beta gamma delta xyz")]
    tdf = spark.createDataFrame(train, "doc_id long, text string")
    pdf = spark.createDataFrame(probe, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_shingles, r.n_hits, r.contamination)
        for r in contamination_scores(tdf, pdf).collect()
    }

    def shingle_set(text, n=3):
        t = text.split()
        return {" ".join(t[i : i + n]) for i in range(max(len(t) - n, 0) + 1)}

    pset = set()
    for _, t in probe:
        pset |= shingle_set(t)
    for i, t in train:
        s = shingle_set(t)
        hits = len(s & pset)
        assert got[i] == (len(s), hits, round(hits / len(s), 6)), i
    assert got[1][1] == 2  # 'alpha beta gamma', 'beta gamma delta'
    assert got[3] == (got[3][0], 0, 0.0)


def test_boilerplate_strip_vs_python_oracle(spark):
    from sparkgraph.text import boilerplate_strip

    footer = "subscribe to our newsletter"
    docs = [
        (1, f"real content one. {footer}. more real stuff"),
        (2, f"other words here. {footer}. tail two"),
        (3, f"third document body. {footer}"),
        (4, "entirely unique document. with unique sentences"),
        (5, ""),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_segments, r.n_kept, r.clean_sha)
        for r in boilerplate_strip(df, min_docs=3).collect()
    }

    segsets = {}
    for i, t in docs:
        segs = [s.strip() for s in t.split(".")]
        segsets[i] = [(p, s) for p, s in enumerate(segs) if s != ""]
    from collections import Counter
    freq = Counter()
    for i, pairs in segsets.items():
        for s in {s for _, s in pairs}:
            freq[s] += 1
    boiler = {s for s, n in freq.items() if n >= 3}
    for i, pairs in segsets.items():
        keep = [(p, s) for p, s in pairs if s not in boiler]
        clean = ".".join(s for _, s in sorted(keep))
        sha = hashlib.sha256(clean.encode()).hexdigest()
        assert got[i] == (len(pairs), len(keep), sha), i
    # the footer was actually stripped from all three carriers
    assert got[1][0] == 3 and got[1][1] == 2
    assert got[3] == (2, 1, got[3][2])
    assert got[5][0] == 0  # empty doc handled
