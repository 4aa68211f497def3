"""Source-table ingest + code-graph derivation vs closed-form expectations."""

import hashlib
import math

from pyspark.sql import functions as F

from sparkgraph.derive import derive_cochange_edges, derive_import_edges
from sparkgraph.graph import Graph
from sparkgraph.ingest import (
    check_id_collisions,
    commit_memberships,
    ingest_sources,
    verify_sha_invariant,
)
from sparkgraph.io.synth import import_targets, synthesize_sources

from tests.oracles import pagerank_oracle

N_REPOS, FPR = 3, 20


def _tables(spark):
    src = synthesize_sources(spark, n_repos=N_REPOS, files_per_repo=FPR)
    verts = ingest_sources(src)
    return src, verts


def test_sha256_invariant_end_to_end(spark):
    src, verts = _tables(spark)
    assert verify_sha_invariant(src, verts) == 0
    # independent re-check in Python against one collected row
    row = verts.orderBy("id").first()
    assert row.content_sha == hashlib.sha256(row.content.encode()).hexdigest()


def test_vertex_ids_stable_and_unique(spark):
    src, verts = _tables(spark)
    assert verts.count() == N_REPOS * FPR
    assert check_id_collisions(verts) == 0
    # re-ingest yields identical ids (order independence)
    verts2 = ingest_sources(src.orderBy(F.desc("path")))
    assert verts.select("id").subtract(verts2.select("id")).count() == 0


def _id_to_file(verts):
    return {
        r.id: (r.repo, int(r.path.split("_")[1].split(".")[0]))
        for r in verts.select("id", "repo", "path").collect()
    }


def test_import_edges_match_generator_grammar(spark):
    src, verts = _tables(spark)
    got_edges = derive_import_edges(verts)
    idmap = _id_to_file(verts)
    got = {(idmap[r.src], idmap[r.dst]) for r in got_edges.collect()}
    want = set()
    for r in range(N_REPOS):
        repo = f"org/project-{r:03d}"
        for f in range(FPR):
            for t in import_targets(f, r, FPR, 3):
                want.add(((repo, f), (repo, t)))
    assert got == want


def test_cochange_edges_pairwise_within_commit(spark):
    src, verts = _tables(spark)
    mem = commit_memberships(src)
    got_df = derive_cochange_edges(mem)
    idmap = _id_to_file(verts)
    got = {(idmap[r.src], idmap[r.dst]) for r in got_df.collect()}
    # independent simulation of the membership rule
    want = set()
    for r in range(N_REPOS):
        repo = f"org/project-{r:03d}"
        for c in range(6):
            members = [
                f for f in range(FPR) if c == 0 or (f + c) % 7 < 3
            ]
            ids = sorted((repo, f) for f in members)
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    want.add((ids[i], ids[j]))
    # got uses src<dst on hashed ids, want on (repo,f); compare as frozensets
    assert {frozenset(p) for p in got} == {frozenset(p) for p in want}


def test_mega_commit_capped(spark):
    src, _ = _tables(spark)
    mem = commit_memberships(src)
    capped = derive_cochange_edges(mem, max_commit_files=10)
    full = derive_cochange_edges(mem, max_commit_files=10_000)
    assert capped.count() < full.count()  # commit 0 (all files) dropped


def test_pagerank_on_derived_code_graph_matches_oracle(spark):
    src, verts = _tables(spark)
    edges = derive_import_edges(verts)
    g = Graph(edges.select("src", "dst", "weight"), num_partitions=4)
    from sparkgraph.algorithms import pagerank

    res = pagerank(g, mode="reference", iterations=15)
    got = {r.id: r.value for r in res.state.collect()}
    pairs = [(r.src, r.dst) for r in edges.collect()]
    want = pagerank_oracle(pairs, iterations=15)
    assert all(math.isclose(got[v], want[v], abs_tol=1e-6) for v in want)
    g.unpersist()


def test_coupling_metrics_match_simulation(spark):
    from sparkgraph.derive import coupling_metrics

    src, verts = _tables(spark)
    got = {
        (r.repo, r.path): (r.ca, r.ce, r.instability)
        for r in coupling_metrics(derive_import_edges(verts), verts).collect()
    }
    assert len(got) == N_REPOS * FPR  # total over V, isolated files included
    # independent simulation of the generator's import rule
    ce, ca = {}, {}
    for r in range(N_REPOS):
        step = r % 5 + 1
        for f in range(FPR):
            targets = {(f + j * step) % FPR for j in range(1, 4)} - {f}
            ce[(r, f)] = len(targets)
            for t in targets:
                ca[(r, t)] = ca.get((r, t), 0) + 1
    exts = ["py", "h", "java"]
    for (r, f), want_ce in ce.items():
        key = (f"org/project-{r:03d}", f"src/mod_{f}.{exts[f % 3]}")
        want_ca = ca.get((r, f), 0)
        g_ca, g_ce, g_inst = got[key]
        assert (g_ca, g_ce) == (want_ca, want_ce)
        tot = want_ca + want_ce
        want_inst = 0.0 if tot == 0 else round(want_ce / tot, 9)
        assert math.isclose(g_inst, want_inst, abs_tol=1e-12)


def test_cochange_rules_match_simulation(spark):
    from sparkgraph.derive import cochange_rules

    src, verts = _tables(spark)
    mem = commit_memberships(src)
    idmap = _id_to_file(verts)
    got = {
        (idmap[r.src], idmap[r.dst]): (r.support, r.confidence)
        for r in cochange_rules(mem, max_commit_files=10, min_support=2).collect()
    }
    # independent simulation: commit c touches f iff c==0 or (f+c)%7<3;
    # cap=10 drops commit 0 (all FPR files)
    from collections import Counter
    per_file, pair = Counter(), Counter()
    for r in range(N_REPOS):
        repo = f"org/project-{r:03d}"
        for c in range(6):
            members = [f for f in range(FPR) if c == 0 or (f + c) % 7 < 3]
            if len(members) > 10:
                continue
            for f in members:
                per_file[(repo, f)] += 1
            for fa in members:
                for fb in members:
                    if fa != fb:
                        pair[((repo, fa), (repo, fb))] += 1
    want = {
        (a, b): (s, round(s / per_file[a], 9))
        for (a, b), s in pair.items()
        if s >= 2
    }
    assert set(got) == set(want)
    for k, (s, conf) in want.items():
        assert got[k][0] == s
        assert math.isclose(got[k][1], conf, abs_tol=1e-12)
