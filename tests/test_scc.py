"""Strongly connected components vs a pure-Python Tarjan oracle."""

import random

import pytest

from sparkgraph.algorithms.scc import strongly_connected_components
from tests.oracles import scc_oracle


def _run(spark, pairs):
    df = spark.createDataFrame(pairs, "src long, dst long")
    res = strongly_connected_components(df)
    got = {r.id: r.scc for r in res.state.collect()}
    return got, res


def test_two_cycles_with_bridge(spark):
    # cycle {0,1,2} → bridge → cycle {10,11}, plus a dangling tail 20→21
    pairs = [(0, 1), (1, 2), (2, 0), (2, 10), (10, 11), (11, 10), (20, 21)]
    got, res = _run(spark, pairs)
    assert got == scc_oracle(pairs)
    assert got[0] == got[1] == got[2] == 0
    assert got[10] == got[11] == 10
    assert got[20] == 20 and got[21] == 21
    assert res.converged


def test_dag_is_all_singletons(spark):
    pairs = [(i, j) for i in range(6) for j in range(i + 1, 6)]
    got, res = _run(spark, pairs)
    assert got == {i: i for i in range(6)} == scc_oracle(pairs)
    assert res.converged


def test_functional_graph_tails_trim_fast(spark):
    # rho shapes: tails into a 3-cycle — trim must dissolve the tails so the
    # whole thing resolves in few rounds
    pairs = [(0, 1), (1, 2), (2, 0)] + [(i, i - 1) for i in range(3, 12)]
    got, res = _run(spark, pairs)
    assert got == scc_oracle(pairs)
    assert res.converged
    assert got[0] == got[1] == got[2] == 0
    assert all(got[i] == i for i in range(3, 12))


def test_one_giant_cycle(spark):
    n = 12
    pairs = [(i, (i + 1) % n) for i in range(n)]
    got, res = _run(spark, pairs)
    assert got == {i: 0 for i in range(n)}
    assert res.converged


def test_max_rounds_truncation_reports_not_converged(spark):
    # chained 2-cycles C0→C1→C2→C3: trim is powerless (every vertex keeps
    # in+out edges) and coloring peels exactly one cycle per round
    pairs = []
    for c in range(4):
        a, b = 10 * c, 10 * c + 1
        pairs += [(a, b), (b, a)]
        if c < 3:
            pairs.append((b, 10 * (c + 1)))
    df = spark.createDataFrame(pairs, "src long, dst long")
    res = strongly_connected_components(df, max_rounds=2)
    assert not res.converged
    # truncated vertices carry NULL, resolved ones a real label
    labels = {r.id: r.scc for r in res.state.collect()}
    assert labels[0] == 0 and labels[1] == 0  # first cycle peeled
    assert any(v is None for v in labels.values())


@pytest.mark.parametrize("seed", [3, 11])
def test_random_digraph_matches_tarjan(spark, seed):
    rng = random.Random(seed)
    n = 40
    pairs = list({(rng.randrange(n), rng.randrange(n)) for _ in range(120)})
    pairs = [(a, b) for a, b in pairs if a != b]
    got, res = _run(spark, pairs)
    assert got == scc_oracle(pairs)
    assert res.converged


def test_condensation_matches_label_join_and_is_acyclic(spark):
    import random

    from sparkgraph.algorithms.scc import condensation, strongly_connected_components

    rng = random.Random(23)
    n = 30
    pairs = list({(rng.randrange(n), rng.randrange(n)) for _ in range(90)})
    pairs = [(a, b) for a, b in pairs if a != b]
    edges = spark.createDataFrame(pairs, "src long, dst long")
    res = strongly_connected_components(edges)
    assert res.converged
    labels = {r.id: r.scc for r in res.state.collect()}
    got = sorted(
        (r.scc_src, r.scc_dst, r.n_edges)
        for r in condensation(edges, res.state).collect()
    )
    # python oracle: group the distinct edge list by (scc, scc)
    from collections import Counter

    cnt = Counter(
        (labels[a], labels[b])
        for a, b in set(pairs)
        if labels[a] != labels[b]
    )
    want = sorted((a, b, c) for (a, b), c in cnt.items())
    assert got == want
    # acyclic: DFS over the condensation DAG finds no back edge
    adj = {}
    for a, b, _ in got:
        adj.setdefault(a, []).append(b)
    seen, done = set(), set()

    def dfs(v, stack):
        seen.add(v)
        stack.add(v)
        for w in adj.get(v, []):
            assert w not in stack, (v, w)  # cycle => SCC was wrong
            if w not in seen:
                dfs(w, stack)
        stack.discard(v)

    for v in list(adj):
        if v not in seen:
            dfs(v, set())
